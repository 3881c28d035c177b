"""DreamX-World-5B-Cam camera-conditioned video pipeline.

Behavioral reference: /root/reference/fastvideo/pipelines/basic/dreamx_world/
dreamx_world_pipeline.py (:25-78) + stages.py: the Wan2.2-TI2V stage stack
with a camera-conditioning stage that converts WASD/JLIK action sequences
into per-latent-frame PRoPE (viewmats, K) consumed by the DiT's camera
self-attention branch (threaded via ``batch.extra['y_camera']`` into the
jitted denoise step).
"""

from __future__ import annotations

import numpy as np

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.models.schedulers.flow_match_euler import (
    FlowMatchEulerDiscreteScheduler)
from fastvideo_tpu.pipelines.basic.dreamx_world.camera import (
    build_dreamx_camera_condition)
from fastvideo_tpu.pipelines.basic.wan.wan_pipeline import WanPipeline
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.stages.base import PipelineStage

logger = init_logger(__name__)

DREAMX_Y_CAMERA_KEY = "y_camera"


class DreamXWorldCameraConditioningStage(PipelineStage):
    """Reference stages.py:22-82."""

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if DREAMX_Y_CAMERA_KEY in batch.extra:
            return batch
        action_seq = batch.extra.get("dreamx_action_seq", ["w"])
        action_speed_list = batch.extra.get("dreamx_action_speed_list", [4])
        if isinstance(action_seq, str):
            action_seq = [action_seq]
        if isinstance(action_speed_list, (int, float)):
            action_speed_list = [action_speed_list]
        if len(action_speed_list) == 1 and len(action_seq) > 1:
            action_speed_list = list(action_speed_list) * len(action_seq)
        latent_t = (int(batch.latents.shape[2])
                    if batch.latents is not None else None)
        y_camera = build_dreamx_camera_condition(
            list(action_seq), [float(s) for s in action_speed_list],
            num_frames=int(batch.num_frames), latent_frame_count=latent_t)
        batch.extra[DREAMX_Y_CAMERA_KEY] = {
            k: np.asarray(v)[None] for k, v in y_camera.items()
        }
        return batch


class DreamXWorldPipeline(WanPipeline):
    """Camera-controlled TI2V generation on the Wan trunk."""

    def initialize_pipeline(self, fastvideo_args: FastVideoArgs) -> None:
        self.modules["scheduler"] = FlowMatchEulerDiscreteScheduler(
            shift=self.pipeline_config.flow_shift or 3.0)

    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        super().create_pipeline_stages(fastvideo_args)
        cam = DreamXWorldCameraConditioningStage()
        pos = self._stages.index(self.denoising_stage)
        self._stages[pos:pos] = [cam]
        self._stage_name_mapping["dreamx_camera_conditioning_stage"] = cam
        self.dreamx_camera_conditioning_stage = cam


class DreamXWorldARPipeline(DreamXWorldPipeline):
    """Autoregressive causal camera pipeline (reference
    dreamx_world_ar_pipeline.py:27-67): same stage topology with the
    streaming AR denoiser."""

    def initialize_pipeline(self, fastvideo_args: FastVideoArgs) -> None:
        self.modules["scheduler"] = FlowMatchEulerDiscreteScheduler(
            shift=self.pipeline_config.flow_shift or 5.0)

    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        from fastvideo_tpu.pipelines.basic.dreamx_world.ar_denoising import (
            DreamXWorldARDenoisingStage)

        super().create_pipeline_stages(fastvideo_args)
        ar = DreamXWorldARDenoisingStage(self.get_module("transformer"),
                                         self.get_module("scheduler"),
                                         self.pipeline_config,
                                         vae=self.get_module("vae"))
        self._stages[self._stages.index(self.denoising_stage)] = ar
        self._stage_name_mapping["denoising_stage"] = ar
        self.denoising_stage = ar


EntryClass = DreamXWorldPipeline
