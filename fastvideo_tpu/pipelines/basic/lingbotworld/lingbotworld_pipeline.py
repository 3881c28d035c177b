"""LingBot-World I2V pipeline.

Behavioral reference: /root/reference/fastvideo/pipelines/basic/
lingbotworld/lingbotworld_pipeline.py (:12-16) — the Wan I2V stage
topology with the camera-conditioned transformer; the Plücker condition
(from a poses/intrinsics action dir or explicit arrays) is built host-
side and rides batch.extra into the denoising step.
"""

from __future__ import annotations

import numpy as np

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.pipelines.basic.wan.wan_pipeline import (
    WanImageToVideoPipeline)
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.stages.base import PipelineStage


class LingBotWorldCameraStage(PipelineStage):
    """extra['action_path'] (poses.npy + intrinsics.npy) or
    extra['c2ws'] + extra['intrinsics'] -> extra['c2ws_plucker_emb'].
    The fold scales follow the VAE compression so the Plücker maps align
    with the latent grid."""

    def __init__(self, vae_config=None):
        self.vae_config = vae_config

    def _scales(self) -> tuple[int, int]:
        arch = getattr(self.vae_config, "arch_config", self.vae_config)
        if arch is None:
            return 8, 4
        return (getattr(arch, "spatial_compression_ratio", 8),
                getattr(arch, "temporal_compression_ratio", 4))

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if batch.extra.get("c2ws_plucker_emb") is not None:
            return batch
        from fastvideo_tpu.pipelines.basic.lingbotworld.camera import (
            build_plucker_condition, load_camera_condition)

        ss, ts = self._scales()
        action_path = batch.extra.get("action_path")
        if action_path:
            batch.extra["c2ws_plucker_emb"] = load_camera_condition(
                action_path, batch.num_frames, batch.height, batch.width,
                ss, ts)
        elif batch.extra.get("c2ws") is not None:
            ks = batch.extra.get("intrinsics")
            if ks is None:
                # canonical pinhole intrinsics when none given
                ks = np.array([batch.width, batch.width,
                               batch.width / 2, batch.height / 2],
                              np.float32)
            batch.extra["c2ws_plucker_emb"] = build_plucker_condition(
                np.asarray(batch.extra["c2ws"], np.float32),
                np.asarray(ks, np.float32).reshape(-1)[:4],
                batch.num_frames, batch.height, batch.width, ss, ts)
        return batch


class LingBotWorldImageToVideoPipeline(WanImageToVideoPipeline):
    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        super().create_pipeline_stages(fastvideo_args)
        cam = LingBotWorldCameraStage(self.pipeline_config.vae_config)
        pos = self._stages.index(self.denoising_stage)
        self._stages[pos:pos] = [cam]
        self._stage_name_mapping["camera_stage"] = cam
        self.camera_stage = cam


EntryClass = LingBotWorldImageToVideoPipeline
