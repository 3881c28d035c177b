"""Z-Image pipeline config.

Behavioral reference: /root/reference/fastvideo/configs/pipelines/
zimage.py (:18-60): Qwen3 text encoding (hidden state -2), AutoencoderKL
image VAE, flow shift 3 with the native discrete schedule.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.dits.zimage import ZImageDiTConfig
from fastvideo_tpu.configs.pipelines.base import PipelineConfig


def zimage_text_postprocess(outputs):
    assert outputs.hidden_states is not None, \
        "Z-Image requires Qwen3 hidden states"
    return outputs.hidden_states[-2]


def _text_encoder_configs():
    from fastvideo_tpu.models.encoders.qwen3 import Qwen3Config

    return (Qwen3Config(),)


def _vae_config():
    from fastvideo_tpu.models.vaes.autoencoder_kl import (
        AutoencoderKLConfig)

    return AutoencoderKLConfig()


@dataclasses.dataclass
class ZImagePipelineConfig(PipelineConfig):
    dit_config: ZImageDiTConfig = dataclasses.field(
        default_factory=ZImageDiTConfig)
    vae_config: object = dataclasses.field(default_factory=_vae_config)
    text_encoder_configs: tuple = dataclasses.field(
        default_factory=_text_encoder_configs)
    postprocess_text_funcs: tuple = (zimage_text_postprocess,)
    text_encoder_extra_kwargs: tuple = ({"output_hidden_states": True},)
    text_encoder_precisions: tuple = ("bf16",)

    flow_shift: float | None = 3.0
    precision: str = "bf16"
    vae_precision: str = "fp32"
