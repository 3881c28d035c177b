"""End-to-end: tiny Cosmos checkpoint -> EDM-preconditioned sampling."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_cosmos_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("cosmos_tiny")
    return make_tiny_cosmos_checkpoint(
        str(root / "Cosmos-Predict2-tiny"))


def test_generate_video_cosmos_e2e(ckpt, tmp_path):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    result = gen.generate_video(
        prompt="w1 w2 w3",
        negative_prompt="w4",
        height=16,
        width=16,
        num_frames=3,
        num_inference_steps=3,
        guidance_scale=3.0,
        seed=4,
        output_path=str(tmp_path),
        save_video=False,
    )
    frames = result["frames"][0]
    assert frames.shape == (3, 16, 16, 3), frames.shape
    assert frames.dtype == np.uint8
    assert np.isfinite(np.asarray(result["latents"])).all()

    r2 = gen.generate_video(prompt="w1 w2 w3", negative_prompt="w4",
                            height=16, width=16, num_frames=3,
                            num_inference_steps=3, guidance_scale=3.0,
                            seed=4, save_video=False)
    np.testing.assert_array_equal(frames, r2["frames"][0])
    par.destroy_mesh()
