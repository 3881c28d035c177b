"""Matrix-Game 2.0 pipeline config
(reference configs/pipelines/matrixgame2.py: Wan I2V stack, no text
encoder, action-conditioned 1.3B transformer)."""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.pipelines.wan import WanT2V480PConfig
from fastvideo_tpu.models.dits.matrixgame2 import MatrixGame2WanVideoConfig


@dataclasses.dataclass
class MatrixGame2I2VConfig(WanT2V480PConfig):
    dit_config: MatrixGame2WanVideoConfig = dataclasses.field(
        default_factory=MatrixGame2WanVideoConfig)
    flow_shift: float | None = 5.0
    vae_precision: str = "fp32"
