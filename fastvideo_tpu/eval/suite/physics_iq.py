"""Physics-IQ benchmark metrics.

Behavioral reference: /root/reference/fastvideo/eval/metrics/physics_iq/
(utils.py:120-290, spatial_iou, spatiotemporal_iou, weighted_spatial_iou,
mse, metric.py): both videos are windowed to 5 s @ 30 fps, downscaled to
quarter resolution, and compared via (a) per-frame MSE on the
quarter-res pixels and (b) IoU variants over binary MOTION MASKS built
from a running-average background model (grayscale blur → accumulated
average → absdiff → threshold → morphological open/close).

This implementation is cv2-based like the original benchmark, INCLUDING
the generated-mask mp4 round-trip (the reference's default,
roundtrip_generated_masks=True): it exists to mimic the original
release's on-disk artefacts and measurably shifts the IoU scores, so
score parity requires it (gated by tests/eval/test_reference_scores.py).
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

    # rint, not truncation: matches tensor_to_uint8_frames (utils.py:38-40)
    u8 = np.clip(np.rint(np.clip(frames, 0, 1) * 255.0), 0,
                 255).astype(np.uint8)
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


def roundtrip_mask_frames(masks: np.ndarray, *, fps: int) -> np.ndarray:
    """mp4 encode/decode of generated masks — the reference applies this
    lossy round-trip to GENERATED masks by default (utils.py:151-171,
    ``roundtrip_generated_masks=True``) to mimic the original Physics-IQ
    release's on-disk artefacts; it measurably shifts the IoU scores, so
    parity requires it. Falls back to identity when cv2 lacks an mp4
    encoder."""
    import os
    import tempfile

    import cv2

    if masks.size == 0:
        return masks
    fd, tmp = tempfile.mkstemp(suffix=".mp4")
    os.close(fd)
    os.unlink(tmp)
    try:
        writer = cv2.VideoWriter(tmp, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                                 (masks.shape[2], masks.shape[1]),
                                 isColor=False)
        if not writer.isOpened():  # pragma: no cover - codec-less cv2
            return masks
        for m in masks:
            writer.write(m)
        writer.release()
        cap = cv2.VideoCapture(tmp)
        frames = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            frames.append(f[..., 0] if f.ndim == 3 else f)
        cap.release()
        return np.stack(frames) if frames else masks
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _prepare_pair(sample: dict, *, target_fps: int, duration: int,
                  threshold: int, alpha: float,
                  cache_key: str = "_physics_iq_pair",
                  gen_key: str = "video", ref_key: str = "reference"):
    """Window + quarter-res resize + motion masks, cached on the sample
    so sibling physics_iq metrics reuse the decode. Mask order matches the
    reference (utils.py:300-365): masks from FULL-res uint8 frames, the
    generated masks round-tripped through mp4, then resized to quarter and
    re-binarized at >127."""
    cached = sample.get(cache_key)
    if cached is not None:
        return cached
    import cv2

    gen = np.asarray(sample[gen_key], np.float32)
    ref = np.asarray(sample[ref_key], np.float32)
    n = target_fps * duration
    gen, ref = gen[:n], ref[:n]
    if not len(gen) or not len(ref):
        raise ValueError("physics_iq needs non-empty videos")
    th, tw = max(ref.shape[1] // 4, 1), max(ref.shape[2] // 4, 1)

    def quarter(v):
        # resize the uint8 frames, then /255 (reference utils.py:326-327)
        u8 = np.clip(np.rint(np.clip(v, 0, 1) * 255.0), 0,
                     255).astype(np.uint8)
        return np.stack([cv2.resize(f, (tw, th))
                         for f in u8]).astype(np.float32) / 255.0

    prepared = {
        "gen_q": quarter(gen),
        "ref_q": quarter(ref),
        "gen_masks": quarter_masks(gen, (tw, th), threshold, alpha,
                                   roundtrip_fps=target_fps),
        "ref_masks": quarter_masks(ref, (tw, th), threshold, alpha),
    }
    sample[cache_key] = prepared
    return prepared


def quarter_masks(frames, size, threshold, alpha,
                  roundtrip_fps: int | None = None):
    import cv2

    masks = generate_motion_masks(frames, threshold=threshold, alpha=alpha)
    if roundtrip_fps is not None:
        masks = roundtrip_mask_frames(masks, fps=roundtrip_fps)
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
    """Combined Physics-IQ score.

    With ``sample['reference_take2']`` (a second real take), computes the
    REFERENCE'S normalized 0-100 score (physics_iq/metric.py:120-140):
    each IoU of (gen, ref) is divided by the physical-variance IoU of
    (ref, take2), the MSE gap is subtracted, x100, clipped to [0, 100],
    rounded to 2. Without a second take, falls back to the plain mean of
    the three IoU variants (documented deviation: no variance normalizer
    available)."""

    def compute(self, sample: dict) -> MetricResult:
        p = self._prepared(sample)
        if p is None:
            return self._skip("needs video and reference")

        def pair_stats(pp):
            n = min(len(pp["gen_q"]), len(pp["ref_q"]))
            return {
                "mse": float(np.mean((pp["gen_q"][:n] - pp["ref_q"][:n])**2)),
                "spatial_iou": spatial_iou(pp["ref_masks"], pp["gen_masks"]),
                "spatiotemporal_iou": spatiotemporal_iou(
                    pp["ref_masks"], pp["gen_masks"]),
                "weighted_spatial_iou": weighted_spatial_iou(
                    pp["ref_masks"], pp["gen_masks"]),
            }

        a = pair_stats(p)
        if sample.get("reference_take2") is None:
            score = float(np.mean([a["spatial_iou"],
                                   a["spatiotemporal_iou"],
                                   a["weighted_spatial_iou"]]))
            return MetricResult(name=self.name, score=score, details=a)
        # variance pair: (reference, reference_take2) — note the variance
        # pair's "generated" side is the first reference, so its masks do
        # get the mp4 round-trip, matching prepare_pair_inputs semantics
        vp = _prepare_pair(sample, **self._kw,
                           cache_key="_physics_iq_variance_pair",
                           gen_key="reference", ref_key="reference_take2")
        v = pair_stats(vp)
        ratio = np.mean([
            a["spatiotemporal_iou"] / max(v["spatiotemporal_iou"], 1e-12),
            a["spatial_iou"] / max(v["spatial_iou"], 1e-12),
            a["weighted_spatial_iou"] / max(v["weighted_spatial_iou"],
                                            1e-12),
        ])
        score = 100.0 * (ratio - (a["mse"] - v["mse"]))
        score = round(float(np.clip(score, 0.0, 100.0)), 2)
        return MetricResult(name=self.name, score=score,
                            details={**a,
                                     **{f"pv_{k}": val
                                        for k, val in v.items()}})


@register("physics_iq")
class PhysicsIQAliasMetric(PhysicsIQMetric):
    """Reference registry-name parity: the bare ``physics_iq`` selector
    resolves to the combined score (reference registers both)."""
