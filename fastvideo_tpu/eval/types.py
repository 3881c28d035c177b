"""Eval result/media containers.

Behavioral reference: /root/reference/fastvideo/eval/types.py (:1-60) —
``MetricResult`` (score=None + details.skipped for gated metrics),
``EvalResults`` (list of per-sample dicts + ``.corpus`` for set metrics),
``Video`` (path-backed handle the pool materialises before metrics run).

Conventions here are numpy-first: decoded frames are ``[T, H, W, C]``
float32 in [0, 1]; audio is ``[samples]`` or ``[samples, ch]`` float32
plus a sample rate.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any


@dataclasses.dataclass
class MetricResult:
    """``score`` is None when the metric was skipped (details["skipped"]
    carries the reason — e.g. gated weights absent under zero egress)."""

    name: str
    score: float | None
    details: dict[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def skipped(self) -> bool:
        return self.score is None


class EvalResults(list):
    """``list[dict[str, MetricResult]]`` (one dict per sample, input
    order) + ``.corpus`` for set-vs-set metrics (FVD/FAD)."""

    def __init__(self, samples=None, corpus=None):
        super().__init__(samples or [])
        self.corpus: dict[str, MetricResult] = corpus or {}


@dataclasses.dataclass
class Video:
    """Path- or array-backed media handle.

    ``frames`` is populated by the pool (``[T, H, W, C]`` float in
    [0, 1]); ``audio``/``audio_sr`` are populated for paths with an
    audio track or .wav sources.
    """

    source: Any = None
    fps: float | None = None
    frames: Any = None
    audio: Any = None
    audio_sr: int | None = None

    def __post_init__(self) -> None:
        if isinstance(self.source, Path):
            self.source = str(self.source)

    def has_frames(self) -> bool:
        return self.frames is not None

    def has_audio(self) -> bool:
        return self.audio is not None
