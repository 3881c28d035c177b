"""HunyuanGameCraft pipeline config.

Behavioral reference: /root/reference/fastvideo/configs/pipelines/
hunyuangamecraft.py (:29-70): HunyuanVideo text encoding (LLaMA template
+ CLIP pooled), GameCraft DiT with CameraNet, flow shift 5, standard CFG
(embedded guidance disabled — official GameCraft passes guidance=None
and combines positive/negative with guidance_scale).
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.dits.hunyuangamecraft import (
    HunyuanGameCraftConfig)
from fastvideo_tpu.configs.pipelines.hunyuan import HunyuanConfig


@dataclasses.dataclass
class HunyuanGameCraftPipelineConfig(HunyuanConfig):
    dit_config: HunyuanGameCraftConfig = dataclasses.field(
        default_factory=HunyuanGameCraftConfig)

    embedded_cfg_scale: float | None = None
    flow_shift: float = 5.0
