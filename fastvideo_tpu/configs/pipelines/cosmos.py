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


def reason1_postprocess_text(outputs):
    """Reason1 'full_concat': concatenate EVERY hidden state on features
    -> [B, S, n_layers * hidden] (reference configs/pipelines/
    cosmos2_5.py Reason1ArchConfig(embedding_concat_strategy=
    'full_concat'); the DiT's crossattn_proj maps it down)."""
    import jax.numpy as jnp

    assert outputs.hidden_states is not None, \
        "reason1 encoding needs output_hidden_states=True"
    return jnp.concatenate(outputs.hidden_states, axis=-1)


def _cosmos25_dit_config():
    from fastvideo_tpu.models.dits.cosmos2_5 import Cosmos25VideoConfig

    return Cosmos25VideoConfig()


def _qwen_encoder_configs():
    from fastvideo_tpu.models.encoders.qwen2_5 import Qwen2Config

    return (Qwen2Config(),)


@dataclasses.dataclass
class Cosmos25Config(PipelineConfig):
    """Cosmos-Predict2.5 (reference configs/pipelines/cosmos2_5.py:39-87):
    Reason1 full-concat text stream, Wan-style VAE, Karras flow-match
    sigmas with shift 5, velocity-predicting DiT."""

    dit_config: object = dataclasses.field(
        default_factory=_cosmos25_dit_config)
    vae_config: object = dataclasses.field(default_factory=_vae_config)
    text_encoder_configs: tuple = dataclasses.field(
        default_factory=_qwen_encoder_configs)
    postprocess_text_funcs: tuple = (reason1_postprocess_text,)
    text_encoder_extra_kwargs: tuple = ({"output_hidden_states": True},)
    text_encoder_precisions: tuple = ("bf16",)
    flow_shift: float | None = 5.0
    precision: str = "bf16"
    vae_precision: str = "bf16"
