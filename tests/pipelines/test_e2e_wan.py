"""End-to-end: tiny Wan checkpoint -> VideoGenerator.generate_video on CPU.

Exercises the full stack: diffusers-format loading, tokenizer, text
encoding, UniPC denoising with CFG, VAE decode, mp4 write.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_wan_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("wan_tiny")
    return make_tiny_wan_checkpoint(str(root / "Wan2.1-T2V-tiny-Diffusers"))


def test_generate_video_e2e(ckpt, tmp_path):
    from fastvideo_tpu import VideoGenerator

    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    result = gen.generate_video(
        prompt="w1 w2 w3",
        height=32,
        width=32,
        num_frames=5,
        num_inference_steps=4,
        guidance_scale=3.0,
        seed=42,
        output_path=str(tmp_path),
        save_video=True,
    )
    assert "frames" in result
    frames = result["frames"][0]
    # temporal factor 2, spatial factor 4 in the tiny VAE
    assert frames.shape == (5, 32, 32, 3), frames.shape
    assert frames.dtype == np.uint8
    assert result["generation_time"] > 0
    assert "DenoisingStage" in result["stage_times"]

    # determinism: same seed -> identical output
    r2 = gen.generate_video(prompt="w1 w2 w3", height=32, width=32,
                            num_frames=5, num_inference_steps=4,
                            guidance_scale=3.0, seed=42,
                            output_path=str(tmp_path), save_video=False)
    np.testing.assert_array_equal(frames, r2["frames"][0])


def test_generate_video_sp2(ckpt, tmp_path):
    """Same checkpoint under an sp=2 mesh must match sp=1 output."""
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    gen1 = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    r1 = gen1.generate_video(prompt="w1 w2", height=32, width=32,
                             num_frames=3, num_inference_steps=2,
                             guidance_scale=1.0, seed=7, save_video=False)
    par.destroy_mesh()
    gen2 = VideoGenerator.from_pretrained(ckpt, num_gpus=2, sp_size=2)
    r2 = gen2.generate_video(prompt="w1 w2", height=32, width=32,
                             num_frames=3, num_inference_steps=2,
                             guidance_scale=1.0, seed=7, save_video=False)
    par.destroy_mesh()
    f1, f2 = r1["frames"][0], r2["frames"][0]
    # uint8 rounding may differ by 1 on a handful of pixels
    assert np.mean(np.abs(f1.astype(int) - f2.astype(int)) <= 1) > 0.999


def test_cfg_delta_cache(ckpt):
    """cfg_cache_interval reuses deltas; output stays close to full CFG."""
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    kwargs = dict(prompt="w1 w2", height=16, width=16, num_frames=3,
                  num_inference_steps=4, guidance_scale=3.0, seed=9,
                  save_video=False)
    full = gen.generate_video(**kwargs)["frames"][0]
    cached = gen.generate_video(cfg_cache_interval=2, **kwargs)["frames"][0]
    import numpy as np

    diff = np.abs(full.astype(int) - cached.astype(int)).mean()
    assert 0 < diff < 30, diff  # approximation, but close
