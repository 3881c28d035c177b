"""End-to-end: tiny SD3.5 checkpoint -> text-to-image on CPU."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_sd35_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("sd35_tiny")
    return make_tiny_sd35_checkpoint(
        str(root / "stable-diffusion-3.5-tiny"))


def test_generate_image_sd35_e2e(ckpt, tmp_path):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    result = gen.generate_video(
        prompt="w1 w2 w3",
        height=32,
        width=32,
        num_frames=1,
        num_inference_steps=4,
        guidance_scale=4.0,
        seed=7,
        output_path=str(tmp_path),
        save_video=False,
    )
    frames = result["frames"][0]
    assert frames.shape == (1, 32, 32, 3), frames.shape
    assert frames.dtype == np.uint8

    # determinism at fixed seed
    r2 = gen.generate_video(prompt="w1 w2 w3", height=32, width=32,
                            num_frames=1, num_inference_steps=4,
                            guidance_scale=4.0, seed=7, save_video=False)
    np.testing.assert_array_equal(frames, r2["frames"][0])

    # CFG path actually ran (different guidance -> different image)
    r3 = gen.generate_video(prompt="w1 w2 w3", height=32, width=32,
                            num_frames=1, num_inference_steps=4,
                            guidance_scale=1.5, seed=7, save_video=False)
    assert np.abs(frames.astype(int) - r3["frames"][0].astype(int)).max() > 0
    par.destroy_mesh()
