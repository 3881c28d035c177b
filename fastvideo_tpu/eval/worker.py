"""EvalWorker: a bag of metric replicas scoring one sample at a time.

Behavioral reference: /root/reference/fastvideo/eval/worker.py (:1-187).
Deviations: no CUDA device plumbing (JAX owns placement; one TPU chip is
shared by all threads through the GIL-released dispatch path), and the
``skip_missing_deps`` drop list also covers weights-gate failures
(zero-egress analog of a missing pip package).
"""

from __future__ import annotations

from typing import Any

from fastvideo_tpu.eval.base import BaseMetric
from fastvideo_tpu.eval.registry import get_metric
from fastvideo_tpu.eval.types import MetricResult, Video
from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)


class EvalWorker:
    def __init__(self, metric_names: list[str], *,
                 skip_missing_deps: bool = False) -> None:
        self._names = list(metric_names)
        self._skip_missing_deps = skip_missing_deps
        self._metrics: dict[str, BaseMetric] = {}
        self._unloaded = False
        self._load()

    @property
    def metric_names(self) -> list[str]:
        return list(self._metrics)

    def _load(self) -> None:
        for name in self._names:
            try:
                m = get_metric(name)
                m.setup()
            except (ImportError, ModuleNotFoundError,
                    FileNotFoundError) as e:
                if self._skip_missing_deps:
                    logger.warning("eval: skipping %s; setup failed: %s",
                                   name, e)
                    continue
                raise
            self._metrics[name] = m
        self._unloaded = False

    def evaluate(self, *, metrics: list[str] | None = None,
                 **kwargs: Any) -> dict[str, MetricResult]:
        """Score one decoded sample. Video handles are unwrapped to their
        frame arrays (audio handles keep the wrapper so audio metrics can
        read .audio/.audio_sr). ``role="reference"`` samples feed set
        metrics only."""
        if self._unloaded:
            raise RuntimeError("EvalWorker unloaded; call reload() first")
        sample = dict(kwargs)
        for key in ("video", "reference"):
            val = sample.get(key)
            if isinstance(val, Video) and isinstance(val.source, str):
                # path-based metrics (e.g. judge.*) read {key}_path after
                # the handle is replaced by its frame array below
                sample.setdefault(f"{key}_path", val.source)
            if isinstance(val, Video) and val.frames is not None:
                sample[key] = val.frames
                if val.fps and "fps" not in sample:
                    sample["fps"] = val.fps
                if val.audio is not None:
                    sample.setdefault(f"{key}_audio", val.audio)
                    sample.setdefault(f"{key}_audio_sr", val.audio_sr)
            elif isinstance(val, Video) and val.audio is not None:
                sample.setdefault(f"{key}_audio", val.audio)
                sample.setdefault(f"{key}_audio_sr", val.audio_sr)
                sample[key] = None

        is_ref = sample.get("role") == "reference"
        filter_set = set(metrics) if metrics is not None else None
        results: dict[str, MetricResult] = {}
        broken: list[str] = []
        for name, m in self._metrics.items():
            if filter_set is not None and name not in filter_set:
                continue
            try:
                if m.is_set_metric:
                    m.accumulate(sample)
                elif not is_ref:
                    results[name] = m.compute(sample)
            except (ImportError, ModuleNotFoundError,
                    FileNotFoundError) as e:
                # lazy-import / lazy-weights failures drop the metric in
                # skip mode; programmer bugs surface either way
                if not self._skip_missing_deps:
                    raise
                logger.warning("eval: dropping %s after %s: %s", name,
                               type(e).__name__, e)
                broken.append(name)
        for n in broken:
            self._metrics.pop(n, None)
        return results

    def set_metrics(self) -> dict[str, BaseMetric]:
        return {n: m for n, m in self._metrics.items() if m.is_set_metric}

    def metrics(self) -> dict[str, BaseMetric]:
        return dict(self._metrics)

    def unload(self) -> None:
        self._metrics = {}
        self._unloaded = True

    def reload(self) -> None:
        if self._unloaded:
            self._load()
