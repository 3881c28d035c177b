"""End-to-end: the bench path — FastWan checkpoint name -> WanDMDPipeline
(3-step DMD) with VIDEO_SPARSE_ATTN pre-tiled attention."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_wan_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("fastwan_tiny")
    # "fastwan2.1"+"t2v" in the path resolves FastWanT2V480PConfig
    # (dmd_denoising_steps -> WanDMDPipeline)
    return make_tiny_wan_checkpoint(
        str(root / "FastWan2.1-T2V-tiny-Diffusers"))


def test_fastwan_dmd_vsa_e2e(ckpt, tmp_path, monkeypatch):
    monkeypatch.setenv("FASTVIDEO_ATTENTION_BACKEND", "VIDEO_SPARSE_ATTN")
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1, VSA_sparsity=0.5)
    # pipeline resolution: DMD stage must be active
    from fastvideo_tpu.pipelines.stages.denoising import DmdDenoisingStage
    pipe = gen.executor.pipeline
    assert any(isinstance(s, DmdDenoisingStage) for s in pipe._stages)

    result = gen.generate_video(prompt="w1 w2 w3", height=32, width=32,
                                num_frames=5, seed=11,
                                output_path=str(tmp_path), save_video=False)
    frames = result["frames"][0]
    assert frames.shape == (5, 32, 32, 3)
    assert frames.dtype == np.uint8
    # 3 DMD steps, one stage record
    assert "DmdDenoisingStage" in result["stage_times"]
    # determinism
    r2 = gen.generate_video(prompt="w1 w2 w3", height=32, width=32,
                            num_frames=5, seed=11, save_video=False)
    np.testing.assert_array_equal(frames, r2["frames"][0])
    par.destroy_mesh()


def test_fastwan_dmd_device_rng(ckpt, monkeypatch):
    """FASTVIDEO_DEVICE_RNG=1 also covers the DMD inter-step renoise
    (pipelines/stages/denoising.py): generation completes and is
    seed-deterministic with on-device threefry noise."""
    monkeypatch.setenv("FASTVIDEO_ATTENTION_BACKEND", "VIDEO_SPARSE_ATTN")
    monkeypatch.setenv("FASTVIDEO_DEVICE_RNG", "1")
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1, VSA_sparsity=0.5)
    kw = dict(prompt="w1 w2", height=32, width=32, num_frames=5, seed=3,
              save_video=False)
    a = gen.generate_video(**kw)["frames"][0]
    b = gen.generate_video(**kw)["frames"][0]
    np.testing.assert_array_equal(a, b)
    par.destroy_mesh()
