"""Matrix-Game 3.0 pipeline config.

Behavioral reference: /root/reference/fastvideo/configs/pipelines/
matrixgame3.py: the Wan stage stack with the Matrix-Game action/camera
DiT, flow shift 5, fp32 light VAE.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.dits.matrixgame3 import (
    MatrixGame3WanVideoConfig)
from fastvideo_tpu.configs.pipelines.wan import WanT2V480PConfig
from fastvideo_tpu.configs.sample import SamplingParam


@dataclasses.dataclass
class MatrixGame3I2V720PConfig(WanT2V480PConfig):
    dit_config: MatrixGame3WanVideoConfig = dataclasses.field(
        default_factory=MatrixGame3WanVideoConfig)
    flow_shift: float | None = 5.0
    vae_precision: str = "fp32"


@dataclasses.dataclass
class MatrixGame3SamplingParam(SamplingParam):
    height: int = 720
    width: int = 1280
    num_frames: int = 57
    fps: int = 16
    num_inference_steps: int = 50
    guidance_scale: float = 6.0
