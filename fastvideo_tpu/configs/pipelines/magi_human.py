"""daVinci-MagiHuman pipeline config.

Behavioral reference: /root/reference/fastvideo/pipelines/basic/magi_human/
pipeline_configs.py: Wan2.2 48-ch video VAE, Stable-Audio Oobleck audio
VAE, T5-Gemma text conditioning padded to 640, FlowUniPC shift 5, CFG=2
with step-dependent video guidance.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.dits.magi_human import (
    MagiHumanVideoConfig as MagiHumanConfig)
from fastvideo_tpu.configs.pipelines.base import PipelineConfig
from fastvideo_tpu.configs.sample import SamplingParam
from fastvideo_tpu.models.encoders.t5gemma import T5GemmaConfig


def _vae_config():
    from fastvideo_tpu.configs.models.vaes.wan import WanVAEConfig

    return WanVAEConfig()


@dataclasses.dataclass
class MagiHumanPipelineConfig(PipelineConfig):
    dit_config: MagiHumanConfig = dataclasses.field(
        default_factory=MagiHumanConfig)
    vae_config: object = dataclasses.field(default_factory=_vae_config)
    text_encoder_configs: tuple = dataclasses.field(
        default_factory=lambda: (T5GemmaConfig(),))
    text_encoder_precisions: tuple = ("bf16",)
    precision: str = "bf16"
    vae_precision: str = "fp32"
    flow_shift: float | None = 5.0

    t5_gemma_target_length: int = 640
    fps: int = 25
    video_txt_guidance_scale: float = 5.0
    audio_txt_guidance_scale: float = 5.0
    cfg_number: int = 2
    vae_stride: tuple = (4, 16, 16)
    z_dim: int = 48
    coords_style: str = "v2"
    text_offset: int = 0
    video_guidance_high_t_threshold: int = 500
    video_guidance_low_t_value: float = 2.0


@dataclasses.dataclass
class MagiHumanSamplingParam(SamplingParam):
    height: int = 256
    width: int = 480
    num_frames: int = 101
    fps: int = 25
    num_inference_steps: int = 50
    guidance_scale: float = 5.0
