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


@register("common.ssim")
class SSIMMetric(_PairMetric):
    fn_name = "ssim"


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
