"""Video quality metrics: PSNR, SSIM, MSE, temporal consistency.

Analog of the reference eval suite's core metrics
(/root/reference/fastvideo/eval/evaluator.py:30-296 + registry). Pure
numpy/jax — no external model deps (VBench/LPIPS-net variants plug in via
the registry when their weights are available locally).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

_METRICS: dict[str, Callable] = {}


def register_metric(name: str):
    def deco(fn):
        _METRICS[name] = fn
        return fn

    return deco


def list_metrics() -> list[str]:
    return sorted(_METRICS)


def compute_metric(name: str, video_a: np.ndarray, video_b: np.ndarray,
                   **kwargs) -> float:
    """videos: [T, H, W, C] uint8 or float in [0, 1]."""
    if name not in _METRICS:
        raise ValueError(f"Unknown metric {name!r}; known: {list_metrics()}")
    return _METRICS[name](_to_float(video_a), _to_float(video_b), **kwargs)


def _to_float(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v)
    if v.dtype == np.uint8:
        return v.astype(np.float64) / 255.0
    return v.astype(np.float64)


@register_metric("mse")
def mse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean((a - b)**2))


@register_metric("psnr")
def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    err = np.mean((a - b)**2)
    if err == 0:
        return float("inf")
    return float(10 * np.log10(data_range**2 / err))


def _ssim_2d(a: np.ndarray, b: np.ndarray, data_range: float = 1.0,
             win: int = 7) -> float:
    """Windowed SSIM (uniform window, skimage-compatible constants)."""
    from scipy.ndimage import uniform_filter

    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range)**2, (k2 * data_range)**2
    mu_a = uniform_filter(a, win)
    mu_b = uniform_filter(b, win)
    mu_aa = uniform_filter(a * a, win)
    mu_bb = uniform_filter(b * b, win)
    mu_ab = uniform_filter(a * b, win)
    n = win**2
    cov_norm = n / (n - 1)
    var_a = cov_norm * (mu_aa - mu_a**2)
    var_b = cov_norm * (mu_bb - mu_b**2)
    cov = cov_norm * (mu_ab - mu_a * mu_b)
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    s = num / den
    pad = (win - 1) // 2
    return float(np.mean(s[pad:-pad, pad:-pad]))


@register_metric("ssim")
def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """Mean per-frame per-channel SSIM over the video."""
    vals = []
    for t in range(a.shape[0]):
        for ch in range(a.shape[-1]):
            vals.append(_ssim_2d(a[t, :, :, ch], b[t, :, :, ch], data_range))
    return float(np.mean(vals))


@register_metric("temporal_consistency")
def temporal_consistency(a: np.ndarray, b: np.ndarray | None = None) -> float:
    """Mean frame-to-frame SSIM of a single video (b ignored)."""
    vals = []
    for t in range(a.shape[0] - 1):
        for ch in range(a.shape[-1]):
            vals.append(_ssim_2d(a[t, :, :, ch], a[t + 1, :, :, ch]))
    return float(np.mean(vals)) if vals else 1.0


@register_metric("lpips")
def lpips(a: np.ndarray, b: np.ndarray, weights=None) -> float:
    """Perceptual distance; gated on local AlexNet-LPIPS weights
    (eval/lpips.py; set $FASTVIDEO_LPIPS_WEIGHTS)."""
    from fastvideo_tpu.eval.lpips import LPIPS

    return LPIPS(weights)(a, b)


# FVD is a SET metric (distribution vs distribution) — exposed via
# fastvideo_tpu.eval.fvd.FVD accumulate/finalize and the eval CLI's
# --metric fvd path, not through the per-pair registry.


class Evaluator:
    """Batch evaluation over (generated, reference) video pairs, plus
    set-level FVD accumulation (reference eval/evaluator.py:30-296)."""

    def __init__(self, metrics: list[str] | None = None,
                 fvd_extractor: str = "pixel"):
        metrics = metrics or ["psnr", "ssim"]
        self.use_fvd = "fvd" in metrics
        self.metrics = [m for m in metrics if m != "fvd"]
        self._fvd = None
        if self.use_fvd:
            from fastvideo_tpu.eval.fvd import FVD

            self._fvd = FVD(extractor=fvd_extractor)

    def evaluate_pair(self, generated: np.ndarray,
                      reference: np.ndarray) -> dict[str, float]:
        if self._fvd is not None:
            self._fvd.accumulate(_to_float(generated), role="generated")
            self._fvd.accumulate(_to_float(reference), role="reference")
        return {
            m: compute_metric(m, generated, reference)
            for m in self.metrics
        }

    def evaluate(self, pairs) -> dict[str, float]:
        results: dict[str, list[float]] = {m: [] for m in self.metrics}
        for gen, ref in pairs:
            for m, v in self.evaluate_pair(gen, ref).items():
                results[m].append(v)
        out = {m: float(np.mean(v)) for m, v in results.items()}
        if self._fvd is not None:
            out["fvd"] = self._fvd.finalize()["fvd"]
        return out
