"""Metric base class for the class-based eval suite.

Behavioral reference: /root/reference/fastvideo/eval/metrics/base.py
(:1-120): per-sample metrics implement ``compute``; set-vs-set metrics
(``is_set_metric=True``) implement ``accumulate``/``finalize`` with
``reset``/``merge_from`` for multi-worker state.

TPU/zero-egress deviations: no ``.to(device)`` juggling (JAX owns
placement; heavy metrics jit their math), and model-backed metrics
declare ``weights_env`` — an environment variable naming a LOCAL weights
path — instead of downloading checkpoints. A metric whose weights env is
unset reports itself unavailable and is group-skipped, exactly like the
reference's missing-pip-dependency path.
"""

from __future__ import annotations

from typing import Any, ClassVar

from fastvideo_tpu.eval.types import MetricResult


class BaseMetric:
    name: ClassVar[str] = ""
    requires_reference: ClassVar[bool] = True
    higher_is_better: ClassVar[bool] = True
    # importable python modules this metric needs
    dependencies: ClassVar[list[str]] = []
    # env var pointing at local weights (zero-egress gate); None = no gate
    weights_env: ClassVar[str | None] = None
    is_set_metric: ClassVar[bool] = False
    # False for path-only metrics (e.g. VLM judges that upload files):
    # when every active metric is path-only, the MediaPool skips frame
    # decoding entirely
    needs_frames: ClassVar[bool] = True

    def setup(self) -> None:
        """Eagerly load weights/jit programs. Called once per worker."""

    def _skip(self, reason: str) -> MetricResult:
        return MetricResult(name=self.name, score=None,
                            details={"skipped": reason})

    def compute(self, sample: dict[str, Any]) -> MetricResult:
        """Per-sample scoring. ``sample["video"]`` is [T, H, W, C] float
        in [0, 1] (the worker unwraps Video handles); ``reference`` has
        the same layout when present."""
        raise NotImplementedError(
            f"{type(self).__name__}.compute not implemented")

    # -- set-vs-set protocol ------------------------------------------------

    def reset(self) -> None:
        """Clear accumulators at the start of an evaluate() call."""

    def accumulate(self, sample: dict[str, Any]) -> None:
        raise NotImplementedError(
            f"{type(self).__name__}.accumulate not implemented")

    def finalize(self) -> MetricResult:
        raise NotImplementedError(
            f"{type(self).__name__}.finalize not implemented")

    def merge_from(self, other: "BaseMetric") -> None:
        """Fold another worker's accumulator state into this one."""
