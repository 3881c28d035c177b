"""Executor: the engine wrapper around a pipeline.

TPU-native collapse of the reference's executor/worker stack
(/root/reference/fastvideo/worker/executor.py:16-86 +
multiproc_executor.py:76): there is no process-per-device fan-out — a single
JAX controller drives the whole mesh SPMD, so ``collective_rpc`` degenerates
to a direct method call. The Executor API shape is preserved for drop-in
compatibility (get_class / execute_forward / shutdown / set_lora_adapter).
"""

from __future__ import annotations

from typing import Any

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.pipelines import build_pipeline
from fastvideo_tpu.pipelines.batch import ForwardBatch

logger = init_logger(__name__)


class Executor:
    def __init__(self, fastvideo_args: FastVideoArgs):
        self.fastvideo_args = fastvideo_args
        self.pipeline = build_pipeline(fastvideo_args)

    @classmethod
    def get_class(cls, fastvideo_args: FastVideoArgs) -> type["Executor"]:
        return cls

    def collective_rpc(self, method: str, *args, **kwargs) -> list[Any]:
        """Single-controller: one 'rank', direct dispatch."""
        target = getattr(self.pipeline, method, None) or getattr(
            self, method)
        return [target(*args, **kwargs)]

    def execute_forward(self, batch: ForwardBatch,
                        fastvideo_args: FastVideoArgs) -> ForwardBatch:
        return self.pipeline.forward(batch, fastvideo_args)

    def set_lora_adapter(self, lora_nickname: str,
                         lora_path: str | None = None) -> None:
        if hasattr(self.pipeline, "set_lora_adapter"):
            self.pipeline.set_lora_adapter(lora_nickname, lora_path)
        else:
            raise NotImplementedError(
                "Pipeline does not support LoRA adapters")

    def shutdown(self) -> None:
        self.pipeline = None
