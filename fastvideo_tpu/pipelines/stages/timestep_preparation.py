"""Timestep preparation stage.

Analog of /root/reference/fastvideo/pipelines/stages/timestep.py: calls
scheduler.set_timesteps with the pipeline's flow_shift; DMD distilled
sampling passes the fixed dmd_denoising_steps list instead.
"""

from __future__ import annotations

import numpy as np

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.stages.base import PipelineStage


class TimestepPreparationStage(PipelineStage):
    def __init__(self, scheduler, pipeline_config=None):
        self.scheduler = scheduler
        self.pipeline_config = pipeline_config

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        shift = None
        if self.pipeline_config is not None:
            shift = self.pipeline_config.flow_shift
        if fastvideo_args.flow_shift is not None:
            shift = fastvideo_args.flow_shift
        if shift is not None:
            self.scheduler.set_shift(shift)

        if batch.dmd_denoising_steps is not None:
            # Distilled few-step sampling: fixed integer timesteps
            # (reference DmdDenoisingStage, stages/denoising.py:1250).
            timesteps = np.asarray(batch.dmd_denoising_steps,
                                   dtype=np.float32)
            num_train = self.scheduler.num_train_timesteps
            sigmas = timesteps / num_train
            self.scheduler.set_timesteps(sigmas=sigmas, shift=1.0)
            batch.timesteps = self.scheduler.timesteps
        else:
            kwargs = {}
            if batch.sigmas is not None:
                kwargs["sigmas"] = np.asarray(batch.sigmas)
            self.scheduler.set_timesteps(batch.num_inference_steps, **kwargs)
            batch.timesteps = self.scheduler.timesteps
        return batch
