"""PipelineStage base: template method with verification + timing.

Analog of /root/reference/fastvideo/pipelines/stages/base.py:29-80.
"""

from __future__ import annotations

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.pipelines.batch import ForwardBatch, timed_stage

logger = init_logger(__name__)


class StageVerificationError(RuntimeError):
    pass


class PipelineStage:
    @property
    def name(self) -> str:
        return type(self).__name__

    def __call__(self, batch: ForwardBatch,
                 fastvideo_args: FastVideoArgs) -> ForwardBatch:
        self.verify_input(batch, fastvideo_args)
        with timed_stage(batch, self.name):
            batch = self.forward(batch, fastvideo_args)
        self.verify_output(batch, fastvideo_args)
        return batch

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        raise NotImplementedError

    def verify_input(self, batch: ForwardBatch,
                     fastvideo_args: FastVideoArgs) -> None:
        pass

    def verify_output(self, batch: ForwardBatch,
                      fastvideo_args: FastVideoArgs) -> None:
        pass
