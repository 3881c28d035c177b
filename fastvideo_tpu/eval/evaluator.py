"""User-facing pre-initialized scorer over the metric suite.

Behavioral reference: /root/reference/fastvideo/eval/evaluator.py
(:30-341): Evaluator → EvalWorker × N → MediaPool; one ``evaluate``
entry point (kwargs = one sample, samples=[...] = fan-out); group/"all"
selectors silently skip unavailable metrics; explicit names raise unless
``skip_missing_deps``; per-call ``metrics=`` filter restricts dispatch
and set-metric reset/finalize so one long-lived Evaluator can score
different corpora with different metric subsets.

TPU shape: workers are threads (metrics are numpy/JAX; JAX dispatch
releases the GIL and a single chip serialises compute anyway), so
``num_workers`` parallelises the CPU-side metrics and decode.
"""

from __future__ import annotations

import threading
from collections.abc import Iterable
from typing import Any

from fastvideo_tpu.eval.registry import (list_metric_classes,
                                         missing_dependencies,
                                         resolve_group)
from fastvideo_tpu.eval.types import EvalResults, MetricResult
from fastvideo_tpu.eval.worker import EvalWorker
from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)


class Evaluator:
    def __init__(self, metrics: list[str] | str = "all",
                 num_workers: int = 1, *, loader_threads: int = 1,
                 prefetch_factor: int = 2,
                 skip_missing_deps: bool = False) -> None:
        names = _resolve_metric_names(metrics,
                                      skip_missing_deps=skip_missing_deps)
        self._workers = [
            EvalWorker(names, skip_missing_deps=skip_missing_deps)
            for _ in range(max(1, num_workers))
        ]
        self._loader_threads = max(1, loader_threads)
        self._prefetch_factor = max(1, prefetch_factor)

    @property
    def num_workers(self) -> int:
        return len(self._workers)

    @property
    def metric_names(self) -> list[str]:
        return self._workers[0].metric_names

    def evaluate(self, samples: Iterable[dict] | None = None, *,
                 metrics: list[str] | None = None,
                 **kwargs: Any) -> dict[str, MetricResult] | EvalResults:
        """One sample (kwargs form) or many (samples=[...] form); the
        list form returns EvalResults with ``.corpus`` for set metrics."""
        if metrics is not None:
            unknown = [m for m in metrics if m not in self.metric_names]
            if unknown:
                raise ValueError(
                    f"metrics filter {unknown} not registered on this "
                    f"Evaluator; registered: {self.metric_names}")
        single = samples is None
        sample_list = [kwargs] if single else list(samples)
        if not sample_list:
            return EvalResults()
        if single:
            set_names = set(self._workers[0].set_metrics())
            active = set_names if metrics is None else set_names & set(
                metrics)
            if active:
                raise ValueError(
                    "Set-vs-set metrics need samples=[...] with >=2 "
                    f"entries; active set metrics: {sorted(active)}")
        per_sample, corpus = self._run(sample_list, metric_filter=metrics)
        if single:
            return per_sample[0]
        return EvalResults(samples=per_sample, corpus=corpus)

    def _run(self, samples: list[dict], *,
             metric_filter: list[str] | None):
        from fastvideo_tpu.eval.pool import MediaPool

        filt = set(metric_filter) if metric_filter is not None else None
        for w in self._workers:
            for name, m in w.set_metrics().items():
                if filt is None or name in filt:
                    m.reset()

        per_sample: list[Any] = [None] * len(samples)
        max_size = self._prefetch_factor * len(self._workers)
        # skip frame decoding when every active metric is path-only
        active = [m for name, m in self._workers[0].metrics().items()
                  if filt is None or name in filt]
        decode_frames = any(
            getattr(m, "needs_frames", True) for m in active) or not active
        with MediaPool(samples, loader_threads=self._loader_threads,
                       max_size=max_size,
                       decode_frames=decode_frames) as pool:
            if len(self._workers) == 1:
                while (item := pool.get()) is not None:
                    idx, decoded = item
                    per_sample[idx] = self._workers[0].evaluate(
                        metrics=metric_filter, **decoded)
            else:
                errors: list[BaseException] = []
                threads = []
                for w in self._workers:
                    t = threading.Thread(
                        target=self._consumer_loop,
                        args=(w, pool, per_sample, errors, metric_filter),
                        daemon=True)
                    t.start()
                    threads.append(t)
                for t in threads:
                    t.join()
                if errors:
                    raise errors[0]

        corpus: dict[str, MetricResult] = {}
        base_set = self._workers[0].set_metrics()
        for name, m in base_set.items():
            if filt is not None and name not in filt:
                continue
            for w in self._workers[1:]:
                other = w.set_metrics().get(name)
                if other is not None:
                    m.merge_from(other)
            corpus[name] = m.finalize()
        return per_sample, corpus

    @staticmethod
    def _consumer_loop(worker, pool, results, errors, metric_filter):
        try:
            while (item := pool.get()) is not None:
                idx, decoded = item
                results[idx] = worker.evaluate(metrics=metric_filter,
                                               **decoded)
        except BaseException as e:  # surfaced via shared list
            errors.append(e)

    def unload(self) -> None:
        for w in self._workers:
            w.unload()

    def reload(self) -> None:
        for w in self._workers:
            w.reload()


def create_evaluator(metrics: list[str] | str = "all",
                     num_workers: int = 1, *,
                     skip_missing_deps: bool = False) -> Evaluator:
    return Evaluator(metrics=metrics, num_workers=num_workers,
                     skip_missing_deps=skip_missing_deps)


def _resolve_metric_names(metrics: list[str] | str, *,
                          skip_missing_deps: bool) -> list[str]:
    """Groups/"all" silently skip unavailable metrics; explicit names
    raise unless skip_missing_deps (reference evaluator.py:290-341)."""
    if metrics == "all":
        return _filter_available(list_metric_classes(), context="all")
    if isinstance(metrics, str):
        metrics = [metrics]
    seen: set[str] = set()
    names: list[str] = []
    for m in metrics:
        group = resolve_group(m)
        if group is not None:
            candidates = _filter_available(group, context=m)
        elif skip_missing_deps:
            candidates = _filter_available([m], context=m)
        else:
            candidates = [m]
        for n in candidates:
            if n not in seen:
                seen.add(n)
                names.append(n)
    return names


def _filter_available(names: list[str], *, context: str) -> list[str]:
    keep = []
    for n in names:
        missing = missing_dependencies(n)
        if missing:
            logger.warning("eval: skipping %s (in %r); unavailable: %s",
                           n, context, ", ".join(missing))
            continue
        keep.append(n)
    return keep
