"""Physics-IQ benchmark metrics.

Behavioral reference: /root/reference/fastvideo/eval/metrics/physics_iq/
(utils.py:120-290, spatial_iou, spatiotemporal_iou, weighted_spatial_iou,
mse, metric.py): both videos are windowed to 5 s @ 30 fps, downscaled to
quarter resolution, and compared via (a) per-frame MSE on the
quarter-res pixels and (b) IoU variants over binary MOTION MASKS built
from a running-average background model (grayscale blur → accumulated
average → absdiff → threshold → morphological open/close).

This implementation is cv2-based like the original benchmark; the mask
video round-trip (mp4 re-encode of generated masks) is skipped — it
exists to mimic the original release's on-disk artefacts, not the
metric's definition.
"""

from __future__ import annotations

import numpy as np

from fastvideo_tpu.eval.base import BaseMetric
from fastvideo_tpu.eval.registry import register
from fastvideo_tpu.eval.types import MetricResult

DEFAULT_TARGET_FPS = 30
DEFAULT_DURATION_SECONDS = 5


def generate_motion_masks(frames: np.ndarray, *, threshold: int = 10,
                          alpha: float = 0.3) -> np.ndarray:
    """[T, H, W, C] float [0,1] → [T, H, W] uint8 {0, 255} motion masks
    via a running-average background model."""
    import cv2

    u8 = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    first = cv2.GaussianBlur(
        cv2.cvtColor(u8[0], cv2.COLOR_RGB2GRAY)
        if u8.shape[-1] == 3 else u8[0, ..., 0], (5, 5), 0)
    avg = first.astype(np.float64)
    masks = [np.zeros_like(first, np.uint8)]
    kernel = np.ones((5, 5), np.uint8)
    for frame in u8[1:]:
        gray = cv2.GaussianBlur(
            cv2.cvtColor(frame, cv2.COLOR_RGB2GRAY)
            if frame.shape[-1] == 3 else frame[..., 0], (5, 5), 0)
        cv2.accumulateWeighted(gray, avg, alpha)
        diff = cv2.absdiff(gray, cv2.convertScaleAbs(avg))
        _, binary = cv2.threshold(diff, threshold, 255, cv2.THRESH_BINARY)
        binary = cv2.morphologyEx(binary, cv2.MORPH_OPEN, kernel)
        binary = cv2.morphologyEx(binary, cv2.MORPH_CLOSE, kernel)
        masks.append(binary)
    return np.stack(masks)


def iou(mask1: np.ndarray, mask2: np.ndarray) -> float:
    union = np.logical_or(mask1, mask2).sum()
    if union == 0:
        return 1.0
    return float(np.logical_and(mask1, mask2).sum() / union)


def spatial_iou(masks1: np.ndarray, masks2: np.ndarray) -> float:
    """IoU of the any-motion-ever footprint."""
    return iou(masks1.max(axis=0) > 0, masks2.max(axis=0) > 0)


def spatiotemporal_iou(masks1: np.ndarray, masks2: np.ndarray) -> float:
    """Mean per-frame mask IoU."""
    n = min(len(masks1), len(masks2))
    return float(np.mean([iou(masks1[i] > 0, masks2[i] > 0)
                          for i in range(n)]))


def weighted_spatial_iou(masks1: np.ndarray, masks2: np.ndarray) -> float:
    """min/max over per-pixel motion frequency maps."""
    w1 = (masks1 > 0).mean(axis=0)
    w2 = (masks2 > 0).mean(axis=0)
    union = np.maximum(w1, w2)
    valid = union > 0
    if valid.sum() == 0:
        return 1.0
    return float(np.minimum(w1, w2)[valid].sum() / union[valid].sum())


def _prepare_pair(sample: dict, *, target_fps: int, duration: int,
                  threshold: int, alpha: float):
    """Window + quarter-res resize + motion masks, cached on the sample
    so sibling physics_iq metrics reuse the decode."""
    cached = sample.get("_physics_iq_pair")
    if cached is not None:
        return cached
    import cv2

    gen = np.asarray(sample["video"], np.float32)
    ref = np.asarray(sample["reference"], np.float32)
    n = target_fps * duration
    gen, ref = gen[:n], ref[:n]
    if not len(gen) or not len(ref):
        raise ValueError("physics_iq needs non-empty videos")
    th, tw = max(ref.shape[1] // 4, 1), max(ref.shape[2] // 4, 1)

    def quarter(v):
        return np.stack([cv2.resize(f, (tw, th)) for f in v])

    prepared = {
        "gen_q": quarter(gen),
        "ref_q": quarter(ref),
        "gen_masks": quarter_masks(gen, (tw, th), threshold, alpha),
        "ref_masks": quarter_masks(ref, (tw, th), threshold, alpha),
    }
    sample["_physics_iq_pair"] = prepared
    return prepared


def quarter_masks(frames, size, threshold, alpha):
    import cv2

    masks = generate_motion_masks(frames, threshold=threshold, alpha=alpha)
    return np.stack([
        (cv2.resize(m, size) > 127).astype(np.uint8) for m in masks
    ])


class _PhysicsIQBase(BaseMetric):
    requires_reference = True

    def __init__(self, *, target_fps: int = DEFAULT_TARGET_FPS,
                 duration_seconds: int = DEFAULT_DURATION_SECONDS,
                 threshold: int = 10, alpha: float = 0.3) -> None:
        self._kw = dict(target_fps=target_fps,
                        duration=duration_seconds,
                        threshold=threshold, alpha=alpha)

    def _prepared(self, sample: dict):
        if sample.get("video") is None or sample.get("reference") is None:
            return None
        return _prepare_pair(sample, **self._kw)


@register("physics_iq.mse")
class PhysicsIQMSEMetric(_PhysicsIQBase):
    higher_is_better = False

    def compute(self, sample: dict) -> MetricResult:
        p = self._prepared(sample)
        if p is None:
            return self._skip("needs video and reference")
        n = min(len(p["gen_q"]), len(p["ref_q"]))
        per_frame = [
            float(np.mean((p["gen_q"][i] - p["ref_q"][i])**2))
            for i in range(n)
        ]
        return MetricResult(name=self.name,
                            score=float(np.mean(per_frame)),
                            details={"per_frame": per_frame})


@register("physics_iq.spatial_iou")
class SpatialIoUMetric(_PhysicsIQBase):
    def compute(self, sample: dict) -> MetricResult:
        p = self._prepared(sample)
        if p is None:
            return self._skip("needs video and reference")
        return MetricResult(name=self.name,
                            score=spatial_iou(p["ref_masks"],
                                              p["gen_masks"]))


@register("physics_iq.spatiotemporal_iou")
class SpatiotemporalIoUMetric(_PhysicsIQBase):
    def compute(self, sample: dict) -> MetricResult:
        p = self._prepared(sample)
        if p is None:
            return self._skip("needs video and reference")
        return MetricResult(name=self.name,
                            score=spatiotemporal_iou(p["ref_masks"],
                                                     p["gen_masks"]))


@register("physics_iq.weighted_spatial_iou")
class WeightedSpatialIoUMetric(_PhysicsIQBase):
    def compute(self, sample: dict) -> MetricResult:
        p = self._prepared(sample)
        if p is None:
            return self._skip("needs video and reference")
        return MetricResult(name=self.name,
                            score=weighted_spatial_iou(p["ref_masks"],
                                                       p["gen_masks"]))


@register("physics_iq.combined")
class PhysicsIQMetric(_PhysicsIQBase):
    """All four Physics-IQ scores in one result (headline = mean of the
    three IoU variants, details carry everything)."""

    def compute(self, sample: dict) -> MetricResult:
        p = self._prepared(sample)
        if p is None:
            return self._skip("needs video and reference")
        n = min(len(p["gen_q"]), len(p["ref_q"]))
        details = {
            "mse": float(np.mean((p["gen_q"][:n] - p["ref_q"][:n])**2)),
            "spatial_iou": spatial_iou(p["ref_masks"], p["gen_masks"]),
            "spatiotemporal_iou": spatiotemporal_iou(p["ref_masks"],
                                                     p["gen_masks"]),
            "weighted_spatial_iou": weighted_spatial_iou(p["ref_masks"],
                                                         p["gen_masks"]),
        }
        score = float(np.mean([details["spatial_iou"],
                               details["spatiotemporal_iou"],
                               details["weighted_spatial_iou"]]))
        return MetricResult(name=self.name, score=score, details=details)


@register("physics_iq")
class PhysicsIQAliasMetric(PhysicsIQMetric):
    """Reference registry-name parity: the bare ``physics_iq`` selector
    resolves to the combined score (reference registers both)."""
