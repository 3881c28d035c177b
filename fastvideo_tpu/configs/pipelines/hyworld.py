"""HYWorld pipeline config.

Behavioral reference: /root/reference/fastvideo/configs/pipelines/
hyworld.py: the hy1.5 T2V config with the HYWorld DiT, SigLIP image
encoder, and the streaming HYWorld VAE.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.dits.hyworld import (
    HYWorldConfig as HYWorldDiTConfig)
from fastvideo_tpu.configs.pipelines.hunyuan15 import Hunyuan15T2V480PConfig
from fastvideo_tpu.configs.sample import SamplingParam


@dataclasses.dataclass
class HYWorldConfig(Hunyuan15T2V480PConfig):
    dit_config: HYWorldDiTConfig = dataclasses.field(
        default_factory=HYWorldDiTConfig)
    flow_shift: float = 5.0


@dataclasses.dataclass
class HYWorldSamplingParam(SamplingParam):
    height: int = 480
    width: int = 832
    num_frames: int = 125
    fps: int = 24
    num_inference_steps: int = 50
    guidance_scale: float = 6.0
