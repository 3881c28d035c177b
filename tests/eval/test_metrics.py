"""Metric sanity: PSNR/SSIM vs known values."""

import numpy as np


def test_psnr_ssim_identity_and_noise():
    from fastvideo_tpu.eval.metrics import Evaluator, compute_metric

    rng = np.random.default_rng(0)
    a = rng.random((4, 32, 32, 3))
    assert compute_metric("psnr", a, a) == float("inf")
    assert abs(compute_metric("ssim", a, a) - 1.0) < 1e-9

    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1)
    p = compute_metric("psnr", a, b)
    assert 15 < p < 25, p
    s = compute_metric("ssim", a, b)
    assert 0 < s < 1

    ev = Evaluator(["psnr", "ssim", "mse"])
    res = ev.evaluate([(a, b), (a, a.copy())])
    assert set(res) == {"psnr", "ssim", "mse"}


def test_ssim_matches_skimage_formula():
    # uniform video should have perfect temporal consistency
    from fastvideo_tpu.eval.metrics import compute_metric

    a = np.ones((3, 16, 16, 1)) * 0.5
    assert compute_metric("temporal_consistency", a, a) == 1.0
