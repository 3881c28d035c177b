"""Activation tracing: per-tensor stats to JSONL, gated by env flags.

Behavioral analog of /root/reference/fastvideo/hooks/activation_trace.py:98-219
(torch forward hooks appending per-module tensor stats to a JSONL sink with
a step filter). The TPU-native shape differs: there are no module hooks on
jitted functions, so tracing happens at the two natural host boundaries —

- **stage outputs**: after every pipeline stage, every ``jax.Array`` hanging
  off the ``ForwardBatch`` is summarised (``trace_batch``, called by
  ``ComposedPipelineBase.forward`` when ``FASTVIDEO_TRACE_ACTIVATIONS`` is
  on);
- **explicit probes**: hot loops (e.g. the denoising step) call
  ``trace_activation("denoise.pred", x, step=i)`` directly.

Env flags (names follow the reference where one exists):
- ``FASTVIDEO_TRACE_ACTIVATIONS``       master switch (off by default)
- ``FASTVIDEO_TRACE_ACTIVATIONS_DIR``   sink directory
- ``FASTVIDEO_TRACE_STEPS``             comma list of step indices to keep
- ``FASTVIDEO_TRACE_LAYERS``            regex filter on the record name

Each record: ``{"name", "step", "shape", "dtype", "mean", "std", "absmax",
"nonfinite"}``. Stats are computed with jnp on device and fetched in one
transfer; tracing forces a host sync per record, which is the cost of a
debugging tool and is why the master switch defaults off.
"""

from __future__ import annotations

import json
import os
import re
import threading
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fastvideo_tpu import envs
from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)

_lock = threading.Lock()
_sink = None  # lazily-opened file handle
_step_filter: set[int] | None = None
_name_filter: re.Pattern | None = None


def _parse_step_filter(spec: str) -> set[int] | None:
    if not spec.strip():
        return None
    return {int(s) for s in spec.split(",") if s.strip()}


def _get_sink():
    global _sink, _step_filter, _name_filter
    with _lock:
        if _sink is None:
            d = envs.FASTVIDEO_TRACE_ACTIVATIONS_DIR
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"trace_{os.getpid()}.jsonl")
            _sink = open(path, "a", buffering=1)  # noqa: SIM115
            _step_filter = _parse_step_filter(
                os.getenv("FASTVIDEO_TRACE_STEPS", ""))
            spec = os.getenv("FASTVIDEO_TRACE_LAYERS", "")
            _name_filter = re.compile(spec) if spec else None
            logger.info("Activation trace JSONL sink: %s", path)
    return _sink


def close_activation_trace() -> None:
    global _sink
    with _lock:
        if _sink is not None and not _sink.closed:
            _sink.close()
        _sink = None


@jax.jit
def _stats(x: jax.Array) -> jax.Array:
    x = x.astype(jnp.float32)
    finite = jnp.isfinite(x)
    safe = jnp.where(finite, x, 0.0)
    n = jnp.maximum(finite.sum(), 1)
    mean = safe.sum() / n
    var = (jnp.where(finite, (x - mean) ** 2, 0.0)).sum() / n
    return jnp.stack([
        mean, jnp.sqrt(var),
        jnp.abs(safe).max(), (~finite).sum().astype(jnp.float32)
    ])


def trace_activation(name: str, value: Any, step: int | None = None) -> None:
    """Record stats for one tensor if tracing is enabled and filters pass."""
    if not envs.FASTVIDEO_TRACE_ACTIVATIONS:
        return
    if not isinstance(value, (jax.Array, np.ndarray)):
        return
    sink = _get_sink()
    if _name_filter is not None and not _name_filter.search(name):
        return
    if (_step_filter is not None and step is not None
            and step not in _step_filter):
        return
    if not jnp.issubdtype(jnp.asarray(value).dtype, jnp.number):
        return
    mean, std, absmax, nonfinite = np.asarray(_stats(jnp.asarray(value)))
    record = {
        "name": name,
        "step": step,
        "shape": list(np.shape(value)),
        "dtype": str(np.asarray(value).dtype),
        "mean": float(mean),
        "std": float(std),
        "absmax": float(absmax),
        "nonfinite": int(nonfinite),
    }
    with _lock:
        sink.write(json.dumps(record) + "\n")


def trace_batch(stage_name: str, batch: Any, step: int | None = None) -> None:
    """Trace every array reachable from a ForwardBatch after a stage."""
    if not envs.FASTVIDEO_TRACE_ACTIVATIONS:
        return
    import dataclasses
    items: list[tuple[str, Any]] = []
    if dataclasses.is_dataclass(batch):
        for f in dataclasses.fields(batch):
            items.append((f.name, getattr(batch, f.name)))
    for label, value in items:
        if isinstance(value, (list, tuple)):
            for i, v in enumerate(value):
                trace_activation(f"{stage_name}.{label}[{i}]", v, step)
        elif isinstance(value, dict):
            for k, v in value.items():
                trace_activation(f"{stage_name}.{label}.{k}", v, step)
        else:
            trace_activation(f"{stage_name}.{label}", value, step)
