"""Optical-flow comparison metrics.

Behavioral reference: /root/reference/fastvideo/eval/metrics/optical_flow/
(_shared.py:100-246 aggregation pipeline; gt_optical_flow/metric.py): two
flow fields per frame pair are reduced to mean-flow EPE/angle/cosine/
magnitude-ratio, masked per-pixel EPE stats, grid-cell EPE, KITTI-style
Fl-all outlier rate, focus-of-expansion distance and a joint
(angle, log-magnitude) histogram KL; per-frame dicts aggregate to
mean/std/max/AUC plus a divergence-onset frame.

Backbone deviation: flows come from the JAX pyramidal Lucas–Kanade solver
(fastvideo_tpu/eval/flow.py) instead of a downloaded CNN flow model —
see that module's docstring.
"""

from __future__ import annotations

import numpy as np

from fastvideo_tpu.eval.base import BaseMetric
from fastvideo_tpu.eval.registry import register
from fastvideo_tpu.eval.types import MetricResult

_AGG_KEYS = ("mf_epe", "mf_angle_err", "mf_cosine", "mf_mag_ratio",
             "pixel_epe_mean", "pixel_epe_max", "px_angle_rmse",
             "grid_epe_mean", "grid_epe_max", "fl_all", "foe_dist",
             "flow_kl_2d")


def estimate_foe(flow: np.ndarray, step: int = 8,
                 min_mag: float = 0.5) -> tuple[float, float]:
    """Least-squares focus of expansion (fx, fy): for radial flow,
    v*(x - fx) = u*(y - fy) → solve [v, -u] @ [fx, fy] = v*x - u*y."""
    h, w = flow.shape[:2]
    yy, xx = np.meshgrid(np.arange(step // 2, h, step),
                         np.arange(step // 2, w, step), indexing="ij")
    yy, xx = yy.ravel(), xx.ravel()
    u = flow[yy, xx, 0]
    v = flow[yy, xx, 1]
    valid = np.sqrt(u**2 + v**2) > min_mag
    if valid.sum() < 10:
        return w / 2.0, h / 2.0
    xx = xx[valid].astype(np.float64)
    yy = yy[valid].astype(np.float64)
    u = u[valid].astype(np.float64)
    v = v[valid].astype(np.float64)
    a = np.column_stack([v, -u])
    b = v * xx - u * yy
    sol, *_ = np.linalg.lstsq(a, b, rcond=None)
    return float(sol[0]), float(sol[1])


def flow_kl_2d(flow_a: np.ndarray, flow_b: np.ndarray,
               n_angle_bins: int = 36, n_mag_bins: int = 20,
               min_mag: float = 0.5) -> float:
    """KL(P_a || P_b) over a joint (angle, log-magnitude) histogram."""

    def hist(flow):
        u, v = flow[..., 0].ravel(), flow[..., 1].ravel()
        mag = np.sqrt(u**2 + v**2)
        ang = np.degrees(np.arctan2(v, u)) % 360
        valid = mag >= min_mag
        if valid.sum() < 10:
            return None
        mag, ang = mag[valid], ang[valid]
        mag_edges = np.logspace(np.log10(min_mag),
                                np.log10(max(mag.max(), min_mag + 1.0)),
                                n_mag_bins + 1)
        ang_edges = np.linspace(0, 360, n_angle_bins + 1)
        h, _, _ = np.histogram2d(ang, mag, bins=[ang_edges, mag_edges])
        return h

    ha, hb = hist(flow_a), hist(flow_b)
    if ha is None or hb is None:
        return 0.0
    p = (ha + 1.0) / (ha + 1.0).sum()
    q = (hb + 1.0) / (hb + 1.0).sum()
    return float((p * np.log(p / q)).sum())


def compare_flow_fields(flow_ref: np.ndarray, flow_gen: np.ndarray, *,
                        grid_size: int = 8, min_mag: float = 0.5,
                        max_mag_pct: float = 80.0) -> dict[str, float]:
    """Per-frame comparison of two [H, W, 2] flow fields
    (reference _shared.py compute_frame_metrics)."""
    m: dict[str, float] = {}
    ref_mag = np.linalg.norm(flow_ref, axis=2)
    gen_mag = np.linalg.norm(flow_gen, axis=2)
    max_mag = np.maximum(ref_mag, gen_mag)
    hi = np.percentile(max_mag, max_mag_pct)
    mask = (max_mag >= min_mag) & (max_mag <= hi)
    n_valid = int(mask.sum())

    if n_valid > 0:
        mean_ref = flow_ref[mask].mean(axis=0)
        mean_gen = flow_gen[mask].mean(axis=0)
    else:
        mean_ref = flow_ref.reshape(-1, 2).mean(axis=0)
        mean_gen = flow_gen.reshape(-1, 2).mean(axis=0)
    m["mf_epe"] = float(np.linalg.norm(mean_ref - mean_gen))

    mag_r = float(np.linalg.norm(mean_ref))
    mag_g = float(np.linalg.norm(mean_gen))
    still = 0.1  # below this the mean flow has no meaningful direction
    if mag_r < still and mag_g < still:
        m["mf_angle_err"], m["mf_cosine"] = 0.0, 1.0
    elif mag_r < still or mag_g < still:
        m["mf_angle_err"], m["mf_cosine"] = 90.0, 0.0
    else:
        cos = float(np.clip(np.dot(mean_ref, mean_gen) / (mag_r * mag_g),
                            -1.0, 1.0))
        m["mf_angle_err"] = float(np.degrees(np.arccos(cos)))
        m["mf_cosine"] = cos
    m["mf_mag_ratio"] = float(mag_g / mag_r) if mag_r > 1e-6 else 1.0

    epe = np.linalg.norm(flow_ref - flow_gen, axis=2)
    sel = epe[mask] if n_valid > 0 else epe
    m["pixel_epe_mean"] = float(sel.mean())
    m["pixel_epe_max"] = float(sel.max())

    moving = mask & (ref_mag > 0.5) & (gen_mag > 0.5)
    if moving.sum() > 0:
        dot = (flow_ref * flow_gen).sum(axis=2)
        cos_map = np.clip(dot / (ref_mag * gen_mag + 1e-8), -1.0, 1.0)
        ang = np.degrees(np.arccos(cos_map))
        m["px_angle_rmse"] = float(np.sqrt((ang[moving]**2).mean()))
    else:
        m["px_angle_rmse"] = 0.0

    h, w = epe.shape
    gh, gw = max(h // grid_size, 1), max(w // grid_size, 1)
    cells = []
    for gi in range(grid_size):
        for gj in range(grid_size):
            cm = mask[gi * gh:(gi + 1) * gh, gj * gw:(gj + 1) * gw]
            ce = epe[gi * gh:(gi + 1) * gh, gj * gw:(gj + 1) * gw]
            if ce.size == 0:
                continue
            cells.append(float(ce[cm].mean()) if cm.sum() > 0 else float(
                ce.mean()))
    m["grid_epe_mean"] = float(np.mean(cells))
    m["grid_epe_max"] = float(np.max(cells))

    outlier = (epe > 3.0) & (epe > 0.05 * ref_mag)
    if n_valid > 0:
        m["fl_all"] = float((outlier & mask).sum() / n_valid)
    else:
        m["fl_all"] = float(outlier.mean())

    fr = estimate_foe(flow_ref)
    fg = estimate_foe(flow_gen)
    m["foe_dist"] = float(np.hypot(fr[0] - fg[0], fr[1] - fg[1]))
    m["flow_kl_2d"] = flow_kl_2d(flow_ref, flow_gen)
    return m


def aggregate_temporal(per_frame: list[dict[str, float]]) -> dict:
    """mean/std/max/AUC per series + divergence onset
    (reference _shared.py aggregate_temporal)."""
    n = len(per_frame)
    if n == 0:
        return {"n_frames": 0}
    out: dict = {"n_frames": n}
    series = {k: np.array([f[k] for f in per_frame]) for k in _AGG_KEYS}
    for name, vals in series.items():
        out[f"{name}_mean"] = float(vals.mean())
        out[f"{name}_std"] = float(vals.std())
        out[f"{name}_max"] = float(vals.max())
        trap = getattr(np, "trapezoid", np.trapz)
        out[f"{name}_auc"] = float(trap(vals)) / max(n - 1, 1)

    epe = series["pixel_epe_mean"]
    window = min(5, n)
    if n >= window:
        baseline = float(np.median(epe[:window]))
        threshold = max(baseline * 2.0, 1.0)
        smoothed = np.convolve(epe, np.ones(window) / window, mode="valid")
        onset = None
        for i, v in enumerate(smoothed):
            if v > threshold:
                onset = int(i)
                break
        out["divergence_onset_frame"] = onset
        out["divergence_threshold"] = threshold
    else:
        out["divergence_onset_frame"] = None
        out["divergence_threshold"] = None
    return out


@register("optical_flow.gt_optical_flow")
class GtOpticalFlowMetric(BaseMetric):
    """Flow-field comparison of a generated video against a ground-truth
    reference. Headline score: pixel_epe_mean_mean (lower better)."""

    higher_is_better = False

    def __init__(self, min_mag: float = 0.5, max_mag_pct: float = 80.0,
                 grid_size: int = 8) -> None:
        self.min_mag = min_mag
        self.max_mag_pct = max_mag_pct
        self.grid_size = grid_size

    def compute(self, sample: dict) -> MetricResult:
        from fastvideo_tpu.eval.flow import extract_video_flows

        video = sample.get("video")
        ref = sample.get("reference")
        if video is None or ref is None:
            return self._skip("needs sample['video'] and ['reference']")
        n = min(len(video), len(ref))
        if n < 2:
            return self._skip("need >=2 frames for optical flow")
        gen_flows = extract_video_flows(np.asarray(video[:n]))
        ref_flows = extract_video_flows(np.asarray(ref[:n]))
        per_frame = [
            compare_flow_fields(ref_flows[i], gen_flows[i],
                                grid_size=self.grid_size,
                                min_mag=self.min_mag,
                                max_mag_pct=self.max_mag_pct)
            for i in range(len(gen_flows))
        ]
        details = aggregate_temporal(per_frame)
        return MetricResult(name=self.name,
                            score=details["pixel_epe_mean_mean"],
                            details=details)


@register("optical_flow.synthetic_optical_flow")
class SyntheticOpticalFlowMetric(BaseMetric):
    """Compare generated flow against a caller-supplied synthetic flow
    field (e.g. derived from a camera-motion spec):
    ``sample['reference_flow']`` is [T-1, H, W, 2] (or [H, W, 2],
    broadcast to every frame pair). Same aggregation pipeline as
    gt_optical_flow (reference synthetic_optical_flow)."""

    higher_is_better = False

    def __init__(self, min_mag: float = 0.5, max_mag_pct: float = 80.0,
                 grid_size: int = 8) -> None:
        self.min_mag = min_mag
        self.max_mag_pct = max_mag_pct
        self.grid_size = grid_size

    def compute(self, sample: dict) -> MetricResult:
        from fastvideo_tpu.eval.flow import extract_video_flows

        video = sample.get("video")
        ref_flow = sample.get("reference_flow")
        if video is None or ref_flow is None:
            return self._skip(
                "needs sample['video'] and ['reference_flow']")
        if len(video) < 2:
            return self._skip("need >=2 frames for optical flow")
        gen_flows = extract_video_flows(np.asarray(video))
        ref_flow = np.asarray(ref_flow, np.float32)
        if ref_flow.ndim == 3:
            ref_flow = np.broadcast_to(ref_flow,
                                       (len(gen_flows), *ref_flow.shape))
        n = min(len(gen_flows), len(ref_flow))
        per_frame = [
            compare_flow_fields(ref_flow[i], gen_flows[i],
                                grid_size=self.grid_size,
                                min_mag=self.min_mag,
                                max_mag_pct=self.max_mag_pct)
            for i in range(n)
        ]
        details = aggregate_temporal(per_frame)
        return MetricResult(name=self.name,
                            score=details["pixel_epe_mean_mean"],
                            details=details)
