"""LPIPS / FVD / eval-CLI tests (weight-free paths; the gated extractors
only verify their gating errors — local pretrained weights are absent in
this environment, mirroring the reference's dependency-gate policy)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))


def test_lpips_structure_random_weights():
    from fastvideo_tpu.eval.lpips import LPIPS, random_lpips_weights

    rng = np.random.default_rng(0)
    a = rng.random((3, 64, 64, 3)).astype(np.float32)
    b = rng.random((3, 64, 64, 3)).astype(np.float32)
    m = LPIPS(random_lpips_weights())
    # identical inputs -> 0; different inputs -> positive
    assert m(a, a) == pytest.approx(0.0, abs=1e-6)
    assert m(a, b) > 0.0


def test_lpips_gating_without_weights(monkeypatch):
    monkeypatch.delenv("FASTVIDEO_LPIPS_WEIGHTS", raising=False)
    from fastvideo_tpu.eval.lpips import load_lpips_weights

    with pytest.raises(FileNotFoundError, match="FASTVIDEO_LPIPS_WEIGHTS"):
        load_lpips_weights()


def test_frechet_distance_closed_form():
    from fastvideo_tpu.eval.fvd import frechet_distance

    d = 8
    mu = np.zeros(d)
    sigma = np.eye(d)
    # identical gaussians -> ~0
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0,
                                                                   abs=1e-4)
    # mean shift only: FD = ||dmu||^2
    mu2 = mu + 2.0
    assert frechet_distance(mu, sigma, mu2, sigma) == pytest.approx(
        4.0 * d, rel=1e-3)
    # isotropic scale: FD = d*(s1 + s2 - 2 sqrt(s1 s2)) for s*I
    s = 4.0
    got = frechet_distance(mu, sigma, mu, s * np.eye(d))
    assert got == pytest.approx(d * (1 + s - 2 * np.sqrt(s)), rel=1e-3)


def test_fvd_pixel_extractor_set_protocol():
    from fastvideo_tpu.eval.fvd import FVD

    rng = np.random.default_rng(1)
    fvd = FVD(extractor="pixel")
    for _ in range(6):
        fvd.accumulate(rng.random((5, 16, 16, 3)), role="generated")
        fvd.accumulate(rng.random((5, 16, 16, 3)), role="reference")
    with pytest.warns(UserWarning, match="256"):
        same_dist = fvd.finalize()
    fvd.reset()
    for _ in range(6):
        fvd.accumulate(rng.random((5, 16, 16, 3)), role="generated")
        fvd.accumulate(rng.random((5, 16, 16, 3)) * 0.2 + 0.8,
                       role="reference")
    with pytest.warns(UserWarning):
        diff_dist = fvd.finalize()
    assert diff_dist["fvd"] > same_dist["fvd"]
    assert same_dist["extractor"] == "pixel"


def test_fvd_i3d_gating(monkeypatch):
    monkeypatch.delenv("FASTVIDEO_I3D_WEIGHTS", raising=False)
    from fastvideo_tpu.eval.fvd import I3DExtractor

    with pytest.raises(FileNotFoundError, match="FASTVIDEO_I3D_WEIGHTS"):
        I3DExtractor()


def test_eval_cli_run_and_list(tmp_path, capsys):
    from fastvideo_tpu.entrypoints.cli.main import main

    rng = np.random.default_rng(0)
    frames = (rng.random((5, 32, 32, 3)) * 255).astype(np.uint8)
    # .npy is the ffmpeg-free interchange format (load_video_frames and
    # VideoGenerator's mp4-write fallback both speak it)
    vid = str(tmp_path / "a.npy")
    np.save(vid, frames)

    assert main(["eval", "list"]) == 0
    out = capsys.readouterr().out
    assert "psnr" in out and "lpips" in out and "fvd" in out

    result_path = str(tmp_path / "res.json")
    assert main(["eval", "run", "--videos", vid, "--reference", vid,
                 "--metrics", "psnr,ssim", "--output", result_path]) == 0
    res = json.load(open(result_path))
    # legacy bare names map onto the class suite (common.*)
    assert res["videos"][0]["scores"]["common.ssim"] == pytest.approx(
        1.0, abs=1e-6)
