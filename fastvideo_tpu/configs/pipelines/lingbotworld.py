"""LingBot-World pipeline config.

Behavioral reference: /root/reference/fastvideo/configs/pipelines/
lingbotworld.py (:10-13): Wan2.2-A14B-style dual-expert I2V with
flow_shift 10 and expert boundary 0.947, camera-conditioned transformer.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.pipelines.wan import WanI2V480PConfig
from fastvideo_tpu.models.dits.lingbotworld import LingBotWorldVideoConfig


@dataclasses.dataclass
class LingBotWorldI2V480PConfig(WanI2V480PConfig):
    dit_config: LingBotWorldVideoConfig = dataclasses.field(
        default_factory=LingBotWorldVideoConfig)
    flow_shift: float | None = 10.0
    boundary_ratio: float | None = 0.947
