"""SSIM infrastructure self-test — runs WITHOUT real weights.

Proves the whole loop (generate -> copy-local install -> manifest verify ->
harness gate) on a tiny random-weight checkpoint, so the env-gated family
suites are known-good machinery the day weights arrive. Reference analog:
fastvideo/tests/ssim/test_reference_videos_cli.py +
test_device_reference_folder.py.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_wan_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("ssim_tiny")
    return make_tiny_wan_checkpoint(str(root / "Wan2.1-T2V-tiny-Diffusers"))


def test_ssim_roundtrip_and_cli(ckpt, tmp_path, monkeypatch):
    monkeypatch.setenv("FASTVIDEO_SSIM_REFS", str(tmp_path / "refs"))
    monkeypatch.setenv("FASTVIDEO_SSIM_DEVICE_KEY", "testdev")
    monkeypatch.setenv("FASTVIDEO_REAL_CKPT_TINY", ckpt)

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator
    from fastvideo_tpu.eval import reference_videos as rv

    kw = dict(prompt="w1 w2", height=32, width=32, num_frames=3,
              num_inference_steps=2, guidance_scale=1.0, seed=5)
    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    frames = np.asarray(gen.generate_video(save_video=False,
                                           return_frames=True, **kw)[0])
    par.destroy_mesh()

    # install as reference (copy-local), then verify manifest
    src = tmp_path / "frames.npy"
    np.save(src, frames)
    rv.copy_local(str(src), "tiny_case")
    res = rv.verify()
    assert res.ok == ["tiny_case"] and not res.corrupt and not res.missing

    # harness drives the product path and gates at SSIM >= bar
    from _harness import run_ssim_case

    score = run_ssim_case("TINY", os.path.basename(ckpt), "tiny_case", kw,
                          ssim_bar=0.99)
    assert score > 0.99  # deterministic regen vs itself

    # corrupt the stored reference -> verify flags it
    ref_path = os.path.join(rv.reference_dir(), "tiny_case.npy")
    bad = np.load(ref_path)
    np.save(ref_path, bad[:, ::-1])
    res = rv.verify()
    assert res.corrupt == ["tiny_case"]

    # CLI surface: refs list + verify (non-zero rc on corruption)
    env = {**os.environ, "PYTHONPATH": os.pathsep.join(sys.path)}
    out = subprocess.run(
        [sys.executable, "-m", "fastvideo_tpu.entrypoints.cli.main",
         "eval", "refs", "list"], capture_output=True, text=True, env=env)
    assert out.returncode == 0 and "tiny_case" in out.stdout
    out = subprocess.run(
        [sys.executable, "-m", "fastvideo_tpu.entrypoints.cli.main",
         "eval", "refs", "verify"], capture_output=True, text=True, env=env)
    assert out.returncode == 1 and "tiny_case" in out.stdout


def test_family_suites_collect_and_skip_loudly():
    """Every family module collects >= 1 real_ckpt case and, with no
    weights configured, skips with actionable instructions."""
    here = os.path.dirname(__file__)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("FASTVIDEO_REAL_CKPT", "FASTVIDEO_CKPT"))}
    env["PYTHONPATH"] = os.pathsep.join(sys.path)
    out = subprocess.run(
        [sys.executable, "-m", "pytest", here, "-m", "real_ckpt",
         "-q", "-rs", "--no-header", "-p", "no:cacheprovider"],
        capture_output=True, text=True, env=env)
    tail = out.stdout[-4000:]
    assert "error" not in tail.lower(), tail
    # >= 10 family cases must be collected (VERDICT round-3 task #5)
    import re

    m = re.search(r"(\d+) skipped", tail)
    assert m and int(m.group(1)) >= 10, tail
    assert "set FASTVIDEO_REAL_CKPT_" in tail
