"""GEN3C pipeline config.

Behavioral reference: /root/reference/fastvideo/configs/pipelines/gen3c.py:
Cosmos-style EDM sampling (sigma_data 0.5), T5-Large padded text
conditioning, 3D-cache conditioning knobs.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.dits.gen3c import Gen3CVideoConfig
from fastvideo_tpu.configs.pipelines.base import PipelineConfig
from fastvideo_tpu.configs.sample import SamplingParam


def _vae_config():
    from fastvideo_tpu.configs.models.vaes.wan import WanVAEConfig

    return WanVAEConfig()


def _t5_config():
    from fastvideo_tpu.configs.models.encoders.t5 import T5Config

    return (T5Config(),)


@dataclasses.dataclass
class Gen3CPipelineConfig(PipelineConfig):
    dit_config: Gen3CVideoConfig = dataclasses.field(
        default_factory=Gen3CVideoConfig)
    vae_config: object = dataclasses.field(default_factory=_vae_config)
    text_encoder_configs: tuple = dataclasses.field(
        default_factory=_t5_config)
    text_encoder_precisions: tuple = ("bf16",)
    precision: str = "bf16"
    vae_precision: str = "bf16"
    flow_shift: float | None = 1.0

    # GEN3C-specific conditioning (reference gen3c.py:84-97)
    frame_buffer_max: int = 2
    noise_aug_strength: float = 0.0
    filter_points_threshold: float = 0.05
    sigma_conditional: float = 0.001
    sigma_data: float = 0.5
    default_trajectory_type: str = "left"
    default_movement_distance: float = 0.3
    default_camera_rotation: str = "center_facing"


@dataclasses.dataclass
class Gen3CSamplingParam(SamplingParam):
    height: int = 720
    width: int = 1280
    num_frames: int = 121
    fps: int = 24
    num_inference_steps: int = 35
    guidance_scale: float = 7.0
