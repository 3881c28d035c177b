"""Executor: the engine wrapper around a pipeline.

TPU-native collapse of the reference's executor/worker stack
(/root/reference/fastvideo/worker/executor.py:16-86 +
multiproc_executor.py:76): there is no process-per-device fan-out — a single
JAX controller drives the whole mesh SPMD, so ``collective_rpc`` degenerates
to a direct method call. The Executor API shape is preserved for drop-in
compatibility (get_class / execute_forward / shutdown / set_lora_adapter).
"""

from __future__ import annotations

import contextlib
import faulthandler
import threading
import time
from typing import Any

from fastvideo_tpu import envs
from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.pipelines import build_pipeline
from fastvideo_tpu.pipelines.batch import ForwardBatch

logger = init_logger(__name__)


@contextlib.contextmanager
def iteration_watchdog(what: str = "engine iteration", *,
                       _clock=time.monotonic,
                       _timer_cls=threading.Timer):
    """Wall-clock guard around one engine iteration.

    Enforces ``FASTVIDEO_ENGINE_ITERATION_TIMEOUT_S`` (reference declares it
    at fastvideo/envs.py:178; the single-controller analog of the
    multiproc executor's worker-death detection): if the iteration exceeds
    the budget, every thread's stack is dumped via :mod:`faulthandler` and a
    critical log line is emitted so a hung XLA dispatch/tunnel is visible
    instead of a silent stall. <=0 disables the guard. The iteration is not
    killed — on TPU the usual cause is a long first compile, and the
    operator decides; the dump makes the hang diagnosable.

    ``_clock`` / ``_timer_cls`` exist so tests can drive the deadline with a
    fake clock and an inert timer instead of real sleeps (deterministic
    under CPU contention).
    """
    timeout = envs.FASTVIDEO_ENGINE_ITERATION_TIMEOUT_S
    if timeout <= 0:
        yield
        return
    fired = threading.Event()
    start = _clock()

    def _alarm() -> None:
        # log BEFORE setting the event: the main thread emits its
        # "eventually completed" line only once ``fired`` is set, so this
        # order guarantees the exceeded line precedes it.
        logger.critical(
            "%s exceeded FASTVIDEO_ENGINE_ITERATION_TIMEOUT_S=%ds "
            "(thread stacks dumped to stderr)", what, timeout)
        fired.set()

    watchdog = _timer_cls(timeout, _alarm)
    watchdog.daemon = True
    watchdog.start()
    try:
        # dumps all thread stacks to stderr if the deadline passes
        faulthandler.dump_traceback_later(timeout, exit=False)
    except (RuntimeError, OSError):  # pragma: no cover - no stderr fd
        pass
    try:
        yield
    finally:
        watchdog.cancel()
        with contextlib.suppress(RuntimeError, OSError):
            faulthandler.cancel_dump_traceback_later()
        elapsed = _clock() - start
        if not fired.is_set() and elapsed > timeout:
            # the Timer expired but cancel() raced its callback (starved
            # scheduler): report the breach deterministically from here
            logger.critical(
                "%s exceeded FASTVIDEO_ENGINE_ITERATION_TIMEOUT_S=%ds "
                "(thread stacks dumped to stderr)", what, timeout)
            fired.set()
        if fired.is_set():
            logger.warning("%s eventually completed after %.1fs "
                           "(budget %ds)", what, elapsed, timeout)


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
        with iteration_watchdog("execute_forward"):
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
