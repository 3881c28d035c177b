"""Wan-family pipeline configs.

Analog of /root/reference/fastvideo/configs/pipelines/wan.py. The t5
postprocess zero-pads each prompt's valid tokens to text_len=512
(t5_postprocess_text, configs/pipelines/wan.py:17-26).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from fastvideo_tpu.configs.models.dits.wan import WanVideoConfig
from fastvideo_tpu.configs.models.encoders.t5 import T5Config
from fastvideo_tpu.configs.models.vaes.wan import WanVAEConfig
from fastvideo_tpu.configs.pipelines.base import PipelineConfig


def t5_postprocess_text(outputs) -> jnp.ndarray:
    """Zero out padded positions and pad/trim to 512 tokens."""
    hidden = outputs.last_hidden_state
    mask = outputs.attention_mask
    if mask is not None:
        hidden = hidden * (mask[..., None] > 0)
    b, s, d = hidden.shape
    target = 512
    if s < target:
        hidden = jnp.pad(hidden, ((0, 0), (0, target - s), (0, 0)))
    else:
        hidden = hidden[:, :target]
    return hidden


@dataclasses.dataclass
class WanT2V480PConfig(PipelineConfig):
    dit_config: WanVideoConfig = dataclasses.field(
        default_factory=WanVideoConfig)
    vae_config: WanVAEConfig = dataclasses.field(default_factory=WanVAEConfig)
    text_encoder_configs: tuple = dataclasses.field(
        default_factory=lambda: (T5Config(),))
    postprocess_text_funcs: tuple = dataclasses.field(
        default_factory=lambda: (t5_postprocess_text,))
    flow_shift: float | None = 3.0
    precision: str = "bf16"
    vae_precision: str = "fp32"
    vae_decode_precision: str = "bf16"
    text_encoder_precisions: tuple = ("fp32",)


@dataclasses.dataclass
class WanT2V720PConfig(WanT2V480PConfig):
    flow_shift: float | None = 5.0


@dataclasses.dataclass
class WanI2V480PConfig(WanT2V480PConfig):
    pass


@dataclasses.dataclass
class WanI2V720PConfig(WanI2V480PConfig):
    flow_shift: float | None = 5.0


@dataclasses.dataclass
class FastWanT2V480PConfig(WanT2V480PConfig):
    """FastWan DMD 3-step distilled sampling (reference configs/pipelines/
    wan.py FastWan2_1_T2V_480P_Config)."""

    flow_shift: float | None = 8.0
    dmd_denoising_steps: list[int] | None = dataclasses.field(
        default_factory=lambda: [1000, 757, 522])
    # bf16 text encoding: MXU-native and halves encoder HBM residency
    # (the fp32 default mirrors the reference's CUDA config; on TPU bf16
    # matches the rest of the FastWan inference stack).
    text_encoder_precisions: tuple = ("bf16",)


@dataclasses.dataclass
class Wan2_2_TI2V_5B_Config(WanT2V480PConfig):
    flow_shift: float | None = 5.0
    ti2v_task: bool = True


@dataclasses.dataclass
class WanV2VConfig(WanT2V480PConfig):
    """Wan video-to-video control (reference pipelines/basic/wan/
    wan_v2v_pipeline.py): denoising input is [noise | video_latent |
    zeros] on channels; control clip encoded with a seeded posterior
    sample."""

    flow_shift: float | None = 5.0


@dataclasses.dataclass
class LucyEditDevConfig(WanT2V480PConfig):
    """decart-ai Lucy-Edit-Dev (reference configs/pipelines/wan.py:263):
    Wan2.2 5B editing — [noise | video] channel concat (in_channels =
    2 * z_dim, declared by the checkpoint), argmax control encoding,
    expanded per-token timesteps."""

    flow_shift: float | None = 5.0
    lucy_edit_task: bool = True

    def __post_init__(self) -> None:
        assert not (self.ti2v_task and self.lucy_edit_task)


@dataclasses.dataclass
class Wan2_2_T2V_A14B_Config(WanT2V480PConfig):
    """Wan2.2 MoE: two experts switched at a timestep boundary
    (reference pipelines/stages/denoising.py:377-401)."""

    flow_shift: float | None = 12.0
    boundary_ratio: float | None = 0.875


@dataclasses.dataclass
class TurboDiffusionT2VConfig(WanT2V480PConfig):
    """TurboDiffusion 1-4 step rCM sampling (reference configs/pipelines/
    turbodiffusion.py:22-66); RCM scheduler installed by the pipeline."""

    flow_shift: float | None = 3.0


@dataclasses.dataclass
class TurboDiffusionT2V14BConfig(TurboDiffusionT2VConfig):
    flow_shift: float | None = 5.0


@dataclasses.dataclass
class TurboDiffusionI2VConfig(WanI2V480PConfig):
    """I2V rCM (sigma_max 200; reference turbodiffusion.py:77-108)."""

    flow_shift: float | None = 5.0
