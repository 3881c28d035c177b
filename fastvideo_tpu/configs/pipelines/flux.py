"""FLUX.1 pipeline config.

Behavioral reference: /root/reference/fastvideo/configs/pipelines/flux.py
(:21-74): CLIP pooled + T5 sequence encoders, embedded distilled guidance
(3.5), FlowMatchEuler with dynamic shifting over packed tokens.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.pipelines.base import PipelineConfig


def flux_clip_pooled_postprocess(outputs):
    assert outputs.pooler_output is not None
    return outputs.pooler_output


def flux_t5_postprocess(outputs):
    return outputs.last_hidden_state


def _text_encoder_configs():
    from fastvideo_tpu.configs.models.encoders.t5 import T5Config
    from fastvideo_tpu.models.encoders.clip import CLIPTextConfig

    return (CLIPTextConfig(), T5Config())


def _dit_config():
    from fastvideo_tpu.models.dits.flux import FluxConfig

    return FluxConfig()


def _vae_config():
    from fastvideo_tpu.models.vaes.autoencoder_kl import AutoencoderKLConfig

    return AutoencoderKLConfig()


@dataclasses.dataclass
class FluxPipelineConfig(PipelineConfig):
    dit_config: object = dataclasses.field(default_factory=_dit_config)
    vae_config: object = dataclasses.field(default_factory=_vae_config)
    text_encoder_configs: tuple = dataclasses.field(
        default_factory=_text_encoder_configs)
    postprocess_text_funcs: tuple = (flux_clip_pooled_postprocess,
                                     flux_t5_postprocess)
    text_encoder_max_lengths: tuple = (77, 512)
    text_encoder_precisions: tuple = ("fp32", "bf16")

    embedded_cfg_scale: float = 3.5
    flow_shift: float | None = None
    precision: str = "bf16"
    vae_precision: str = "fp32"
