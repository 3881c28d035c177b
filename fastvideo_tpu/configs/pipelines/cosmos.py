"""Cosmos pipeline config.

Behavioral reference: /root/reference/fastvideo/configs/pipelines/cosmos.py
(:40-70): single T5 encoder (bf16), Wan VAE, EDM sigma space
(sigma_data 1.0), flow_shift 1.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.pipelines.base import PipelineConfig


def _dit_config():
    from fastvideo_tpu.models.dits.cosmos import CosmosVideoConfig

    return CosmosVideoConfig()


def _vae_config():
    from fastvideo_tpu.configs.models.vaes.wan import WanVAEConfig

    return WanVAEConfig()


def _text_encoder_configs():
    from fastvideo_tpu.configs.models.encoders.t5 import T5Config

    return (T5Config(),)


@dataclasses.dataclass
class CosmosConfig(PipelineConfig):
    dit_config: object = dataclasses.field(default_factory=_dit_config)
    vae_config: object = dataclasses.field(default_factory=_vae_config)
    text_encoder_configs: tuple = dataclasses.field(
        default_factory=_text_encoder_configs)
    text_encoder_precisions: tuple = ("bf16",)
    flow_shift: float | None = 1.0
    precision: str = "bf16"
    vae_precision: str = "fp32"
    sigma_data: float = 1.0
