"""Metric policies for rolling-baseline regression comparison.

Behavioral reference: /root/reference/fastvideo/performance/
metric_policy.py (:11-140): each tracked metric carries a direction,
percent + absolute noise floors, and a gating flag; a regression fires
only when the delta moves in the bad direction beyond BOTH floors.
Keys reflect this framework's bench schema (e2e seconds, per-stage
seconds, steps/s, HBM GB).
"""

from __future__ import annotations

import dataclasses
from collections.abc import Mapping
from typing import Any


@dataclasses.dataclass(frozen=True)
class MetricPolicy:
    key: str
    label: str
    precision: int
    lower_is_better: bool
    threshold_percent: float  # fraction, e.g. 0.08 = 8%
    threshold_absolute: float
    gated: bool = True


@dataclasses.dataclass(frozen=True)
class MetricDelta:
    absolute: float
    percent: float  # signed, positive = worse
    threshold_exceeded: bool
    regressed: bool


DEFAULT_METRIC_POLICIES: tuple[MetricPolicy, ...] = (
    MetricPolicy("e2e_s", "E2E", 3, True, 0.08, 0.3),
    MetricPolicy("steps_per_s", "Steps/s", 3, False, 0.08, 0.02),
    MetricPolicy("memory_gb", "HBM", 1, True, 0.05, 0.25),
    MetricPolicy("text_encoder_time_s", "Text Enc", 3, True, 0.10, 0.05),
    MetricPolicy("dit_time_s", "DiT", 3, True, 0.05, 0.15),
    MetricPolicy("vae_decode_time_s", "VAE Decode", 3, True, 0.05, 0.15),
)


def _opt_float(value: Any) -> float | None:
    if value is None or isinstance(value, bool):
        return None
    try:
        return float(value)
    except (TypeError, ValueError):
        return None


def _opt_bool(value: Any) -> bool | None:
    if isinstance(value, bool):
        return value
    if isinstance(value, str):
        v = value.strip().lower()
        if v in {"1", "true", "yes", "on"}:
            return True
        if v in {"0", "false", "no", "off"}:
            return False
    return None


def resolve_metric_policies(
        overrides: Mapping[str, Any] | None) -> tuple[MetricPolicy, ...]:
    """Default policies with optional per-metric
    {threshold_percent, threshold_absolute, gated} overrides (the record's
    own ``regression_thresholds`` field)."""
    if not isinstance(overrides, Mapping):
        overrides = {}
    out: list[MetricPolicy] = []
    for base in DEFAULT_METRIC_POLICIES:
        ov = overrides.get(base.key, {})
        if not isinstance(ov, Mapping):
            ov = {}
        pct = _opt_float(ov.get("threshold_percent"))
        absolute = _opt_float(ov.get("threshold_absolute"))
        gated = _opt_bool(ov.get("gated"))
        out.append(dataclasses.replace(
            base,
            threshold_percent=pct if pct is not None
            else base.threshold_percent,
            threshold_absolute=absolute if absolute is not None
            else base.threshold_absolute,
            gated=gated if gated is not None else base.gated))
    return tuple(out)


def regression_delta(policy: MetricPolicy, current: float,
                     baseline: float) -> MetricDelta:
    """Signed delta in the 'worse' direction; regressed only when both
    the percent and absolute floors are exceeded AND the policy gates."""
    raw = current - baseline
    worse = raw if policy.lower_is_better else -raw
    pct = worse / abs(baseline) if baseline else 0.0
    exceeded = (worse > policy.threshold_absolute
                and pct > policy.threshold_percent)
    return MetricDelta(absolute=raw, percent=pct,
                       threshold_exceeded=exceeded,
                       regressed=exceeded and policy.gated)
