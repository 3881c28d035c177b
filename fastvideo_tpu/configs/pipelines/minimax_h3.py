"""MiniMax-H3 pipeline config.

Behavioral reference: /root/reference/fastvideo/configs/pipelines/
minimax_h3.py (MiniMaxH3PipelineConfig): fixed video/audio scheduler
shifts (12 / 3), bf16 DiT, fp32 VAEs, bf16 Qwen3-VL conditioning.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.dits.minimax_h3 import MiniMaxH3Config
from fastvideo_tpu.configs.pipelines.base import PipelineConfig
from fastvideo_tpu.configs.sample import SamplingParam
from fastvideo_tpu.models.encoders.minimax_h3_qwen3_vl import (
    MiniMaxH3Qwen3VLConfig)
from fastvideo_tpu.models.vaes.minimax_h3_audio import (
    MiniMaxH3AudioVAEArchConfig)
from fastvideo_tpu.models.vaes.minimax_h3_video import (
    MiniMaxH3VideoVAEArchConfig, MiniMaxH3VideoVAEConfig)


from fastvideo_tpu.configs.models.base import ModelConfig


@dataclasses.dataclass
class MiniMaxH3AudioVAEConfig(ModelConfig):
    arch_config: MiniMaxH3AudioVAEArchConfig = dataclasses.field(
        default_factory=MiniMaxH3AudioVAEArchConfig)


@dataclasses.dataclass
class MiniMaxH3PipelineConfig(PipelineConfig):
    dit_config: MiniMaxH3Config = dataclasses.field(
        default_factory=MiniMaxH3Config)
    vae_config: MiniMaxH3VideoVAEConfig = dataclasses.field(
        default_factory=MiniMaxH3VideoVAEConfig)
    audio_vae_config: MiniMaxH3AudioVAEConfig = dataclasses.field(
        default_factory=MiniMaxH3AudioVAEConfig)
    text_encoder_configs: tuple = dataclasses.field(
        default_factory=lambda: (MiniMaxH3Qwen3VLConfig(),))
    text_encoder_precisions: tuple = ("bf16",)
    precision: str = "bf16"
    vae_precision: str = "fp32"
    # fixed scheduler shifts (video 12, audio 3); flow_shift stays unset
    flow_shift: float | None = None


@dataclasses.dataclass
class MiniMaxH3SamplingParam(SamplingParam):
    """T2VA defaults (reference presets.py MINIMAX_H3_T2VA)."""

    height: int = 768
    width: int = 1344
    num_frames: int = 124
    fps: int = 24
    num_inference_steps: int = 50
    guidance_scale: float = 1.0
    negative_prompt: str = ""
    seed: int = 0
