"""Core pixel/perceptual metrics as registry classes.

Behavioral reference: /root/reference/fastvideo/eval/metrics/common/
(psnr, ssim, lpips, fvd). Wraps the round-1 function metrics
(fastvideo_tpu/eval/metrics.py) and set-level FVD (eval/fvd.py) behind
the class protocol so they ride the Evaluator/worker/pool pipeline.
"""

from __future__ import annotations

import numpy as np

from fastvideo_tpu.eval.base import BaseMetric
from fastvideo_tpu.eval.registry import register
from fastvideo_tpu.eval.types import MetricResult


def _videos(sample: dict, need_ref: bool = True):
    video = sample.get("video")
    ref = sample.get("reference")
    if video is None:
        return None, None, "missing sample['video']"
    if need_ref and ref is None:
        return None, None, "missing sample['reference']"
    if ref is not None:
        n = min(len(video), len(ref))
        video, ref = video[:n], ref[:n]
    return np.asarray(video), (None if ref is None else np.asarray(ref)), None


class _PairMetric(BaseMetric):
    """Per-sample metric delegating to the function registry."""

    fn_name = ""

    def compute(self, sample: dict) -> MetricResult:
        from fastvideo_tpu.eval.metrics import compute_metric

        video, ref, err = _videos(sample, self.requires_reference)
        if err:
            return self._skip(err)
        score = compute_metric(self.fn_name, video,
                               ref if ref is not None else video)
        return MetricResult(name=self.name, score=float(score))


@register("common.mse")
class MSEMetric(_PairMetric):
    fn_name = "mse"
    higher_is_better = False


@register("common.psnr")
class PSNRMetric(_PairMetric):
    fn_name = "psnr"


def _gaussian_kernel1d(size: int, sigma: float) -> "np.ndarray":
    import numpy as np

    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-coords**2 / (2 * sigma**2))
    return g / g.sum()


def _ssim_reference(gen: "np.ndarray", ref: "np.ndarray",
                    window_size: int = 11) -> float:
    """SSIM with the REFERENCE implementation's exact math
    (fastvideo/eval/metrics/common/ssim/metric.py:10-37): separable
    gaussian window (sigma 1.5), biased covariance, zero-padded borders
    INCLUDED in the mean. Inputs [T, H, W, C] float in [0, 1]."""
    import numpy as np
    from scipy.ndimage import correlate1d

    k = _gaussian_kernel1d(window_size, 1.5)
    c1, c2 = 0.01**2, 0.03**2

    def blur(x):  # zero-padded separable gaussian over (H, W)
        out = correlate1d(x, k, axis=1, mode="constant", cval=0.0)
        return correlate1d(out, k, axis=2, mode="constant", cval=0.0)

    x = gen.astype(np.float64)
    y = ref.astype(np.float64)
    mu_x, mu_y = blur(x), blur(y)
    sigma_x2 = blur(x * x) - mu_x**2
    sigma_y2 = blur(y * y) - mu_y**2
    sigma_xy = blur(x * y) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sigma_x2 + sigma_y2 + c2)
    return float(np.mean(num / den))


@register("common.ssim")
class SSIMMetric(_PairMetric):
    fn_name = "ssim"

    def compute(self, sample: dict) -> MetricResult:
        video, ref, err = _videos(sample)
        if err:
            return self._skip(err)
        n = min(len(video), len(ref))
        score = _ssim_reference(video[:n], ref[:n])
        return MetricResult(name=self.name, score=score)


@register("common.temporal_consistency")
class TemporalConsistencyMetric(_PairMetric):
    fn_name = "temporal_consistency"
    requires_reference = False


@register("common.lpips")
class LPIPSMetric(BaseMetric):
    """AlexNet-LPIPS (JAX); gated on local weights (eval/lpips.py)."""

    higher_is_better = False
    weights_env = "FASTVIDEO_LPIPS_WEIGHTS"

    def __init__(self) -> None:
        self._net = None

    def setup(self) -> None:
        if self._net is None:
            from fastvideo_tpu.eval.lpips import LPIPS

            self._net = LPIPS()

    def compute(self, sample: dict) -> MetricResult:
        video, ref, err = _videos(sample)
        if err:
            return self._skip(err)
        if self._net is None:
            self.setup()
        return MetricResult(name=self.name,
                            score=float(self._net(video, ref)))


@register("common.fvd")
class FVDMetric(BaseMetric):
    """Set-vs-set Fréchet Video Distance (eval/fvd.py). The default
    'pixel' extractor is always available; CLIP/I3D extractors follow
    their own weights gates when constructed explicitly."""

    higher_is_better = False
    is_set_metric = True

    def __init__(self, extractor: str = "pixel", **kwargs) -> None:
        from fastvideo_tpu.eval.fvd import FVD

        self._fvd = FVD(extractor=extractor, **kwargs)

    def reset(self) -> None:
        self._fvd.reset()

    def accumulate(self, sample: dict) -> None:
        video = sample.get("video")
        if video is None:
            return
        role = ("reference"
                if sample.get("role") == "reference" else "generated")
        self._fvd.accumulate(np.asarray(video, np.float64), role=role)
        ref = sample.get("reference")
        if ref is not None:
            self._fvd.accumulate(np.asarray(ref, np.float64),
                                 role="reference")

    def merge_from(self, other: "FVDMetric") -> None:
        self._fvd._gen.extend(other._fvd._gen)
        self._fvd._ref.extend(other._fvd._ref)

    def finalize(self) -> MetricResult:
        if not self._fvd._gen or not self._fvd._ref:
            return self._skip("needs >=1 generated and >=1 reference video")
        out = self._fvd.finalize()
        return MetricResult(name=self.name, score=out["fvd"], details=out)
