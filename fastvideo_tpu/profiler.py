"""Profiling: jax.profiler traces + named regions + stage timing.

Analog of /root/reference/fastvideo/profiler.py:42-415 (torch.profiler
controller with env-driven config and named regions). TPU equivalent:
``jax.profiler`` traces (viewable in XProf/TensorBoard), ``TraceAnnotation``
named regions, and the per-stage wall-time map in PipelineLoggingInfo.
"""

from __future__ import annotations

import contextlib
import os

from fastvideo_tpu import envs
from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)

_active = False
_step_count = 0
_regions: dict[str, bool] = {}


def register_region(token: str, enabled: bool = True) -> None:
    """Named-region registry (reference profiler.py:42-117)."""
    _regions[token] = enabled


def set_region_enabled(token: str, enabled: bool) -> None:
    _regions[token] = enabled


@contextlib.contextmanager
def profile_region(token: str):
    """Annotate a region in the trace when its token is enabled."""
    if not _regions.get(token, True):
        yield
        return
    try:
        import jax.profiler

        with jax.profiler.TraceAnnotation(token):
            yield
    except Exception:
        yield


def maybe_start_profiler(step: int) -> None:
    """Start a windowed trace per FASTVIDEO_TRACE_DIR /
    FASTVIDEO_PROFILE_START_STEP / FASTVIDEO_PROFILE_NUM_STEPS."""
    global _active
    trace_dir = envs.FASTVIDEO_TRACE_DIR
    if not trace_dir or _active:
        return
    if step == envs.FASTVIDEO_PROFILE_START_STEP:
        import jax.profiler

        os.makedirs(trace_dir, exist_ok=True)
        jax.profiler.start_trace(trace_dir)
        _active = True
        logger.info("Started jax profiler trace -> %s", trace_dir)


def maybe_stop_profiler(step: int) -> None:
    global _active
    if not _active:
        return
    stop = (envs.FASTVIDEO_PROFILE_START_STEP +
            envs.FASTVIDEO_PROFILE_NUM_STEPS)
    if step >= stop:
        import jax.profiler

        jax.profiler.stop_trace()
        _active = False
        logger.info("Stopped jax profiler trace")


@contextlib.contextmanager
def trace(dir_: str):
    """One-shot trace context."""
    import jax.profiler

    os.makedirs(dir_, exist_ok=True)
    jax.profiler.start_trace(dir_)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
