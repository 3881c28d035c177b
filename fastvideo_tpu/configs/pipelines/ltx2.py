"""LTX-2 pipeline config.

Behavioral reference: /root/reference/fastvideo/pipelines/basic/ltx2/
pipeline_configs.py (:20-60): Gemma text stack (last hidden state),
LTX-2 video VAE, distilled 8-step sigma schedule inside the denoising
stage. Audio decoder + vocoder configs attach when the checkpoint ships
them.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.pipelines.base import PipelineConfig
from fastvideo_tpu.models.dits.ltx2 import LTX2VideoConfig


def ltx2_postprocess_text(outputs):
    return outputs.last_hidden_state


def _vae_config():
    from fastvideo_tpu.models.vaes.ltx2 import LTX2VAEConfig

    return LTX2VAEConfig()


def _gemma_configs():
    from fastvideo_tpu.models.encoders.gemma import GemmaConfig

    return (GemmaConfig(),)


@dataclasses.dataclass
class LTX2T2VConfig(PipelineConfig):
    dit_config: LTX2VideoConfig = dataclasses.field(
        default_factory=LTX2VideoConfig)
    vae_config: object = dataclasses.field(default_factory=_vae_config)
    text_encoder_configs: tuple = dataclasses.field(
        default_factory=_gemma_configs)
    postprocess_text_funcs: tuple = (ltx2_postprocess_text,)
    text_encoder_precisions: tuple = ("bf16",)
    precision: str = "bf16"
    vae_precision: str = "bf16"
