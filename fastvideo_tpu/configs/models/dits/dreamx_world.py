"""DreamX-World DiT config.

Behavioral reference: /root/reference/fastvideo/configs/models/dits/
dreamx_world.py (:9-50): Wan arch + PRoPE camera-branch knobs.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.base import ModelConfig
from fastvideo_tpu.configs.models.dits.wan import (WAN_PARAM_NAMES_MAPPING,
                                                   WanArchConfig)


@dataclasses.dataclass
class DreamXWorldArchConfig(WanArchConfig):
    add_control_adapter: bool = True
    cam_method: str | None = "prope"
    attn_compress: int = 1
    cam_self_attn_layers: tuple[int, ...] | None = None


@dataclasses.dataclass
class DreamXWorldConfig(ModelConfig):
    arch_config: DreamXWorldArchConfig = dataclasses.field(
        default_factory=DreamXWorldArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(WAN_PARAM_NAMES_MAPPING))
