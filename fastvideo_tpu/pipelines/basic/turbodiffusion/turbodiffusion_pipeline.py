"""TurboDiffusion 1-4 step video pipeline (rCM + SLA + int8).

Analog of /root/reference/fastvideo/pipelines/basic/turbodiffusion/
turbodiffusion_pipeline.py (:20-66) + turbodiffusion_i2v_pipeline.py:
Wan architecture sampled with the RCM scheduler (sigma_max 80 T2V / 200
I2V); the TurboDiffusion checkpoints pair it with SLA attention and the
W8A8 int8 layers (layers/quantization/int8.py) — both selectable via
FASTVIDEO_ATTENTION_BACKEND=SLA_ATTN and the quantized linear swap.
"""

from __future__ import annotations

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.models.schedulers.scheduling_rcm import RCMScheduler
from fastvideo_tpu.pipelines.basic.wan.wan_pipeline import (
    WanImageToVideoPipeline, WanPipeline)


class TurboDiffusionPipeline(WanPipeline):
    """T2V: RCM sampling over the Wan stack (reference :20-64)."""

    def initialize_pipeline(self, fastvideo_args: FastVideoArgs) -> None:
        self.modules["scheduler"] = RCMScheduler(sigma_max=80.0)


class TurboDiffusionI2VPipeline(WanImageToVideoPipeline):
    """I2V: sigma_max 200 (reference turbodiffusion_i2v_pipeline.py)."""

    def initialize_pipeline(self, fastvideo_args: FastVideoArgs) -> None:
        self.modules["scheduler"] = RCMScheduler(sigma_max=200.0)


EntryClass = TurboDiffusionPipeline
