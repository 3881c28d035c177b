"""Eval suite: class-based metrics + Evaluator/worker/pool pipeline
(reference fastvideo/eval/) alongside the round-1 function metrics
(eval/metrics.py) and perf harness (eval/perf.py)."""

from fastvideo_tpu.eval.types import EvalResults, MetricResult, Video

__all__ = ["MetricResult", "EvalResults", "Video", "Evaluator",
           "create_evaluator"]


def __getattr__(name):
    # lazy: importing fastvideo_tpu.eval shouldn't pull jax/cv2
    if name in ("Evaluator", "create_evaluator"):
        from fastvideo_tpu.eval import evaluator

        return getattr(evaluator, name)
    raise AttributeError(name)
