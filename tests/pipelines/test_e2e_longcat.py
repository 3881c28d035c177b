"""End-to-end: tiny LongCat-Video checkpoint -> VideoGenerator on CPU.

Exercises the CFG-zero optimized guidance path (batched neg/pos, st*
scale, negated flow prediction) and the I2V conditioning path (first
latent frame = VAE-encoded image, held fixed; per-frame timesteps with
t=0 on conditioning frames; split attention)
(reference pipelines/basic/longcat/).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_longcat_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("longcat_tiny")
    return make_tiny_longcat_checkpoint(
        str(root / "LongCat-Video-tiny-Diffusers"))


def test_generate_video_longcat_t2v(ckpt, tmp_path):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    result = gen.generate_video(
        prompt="a cat  walks", negative_prompt="static",
        height=16, width=16, num_frames=5, num_inference_steps=2,
        guidance_scale=4.0, seed=9, output_path=str(tmp_path),
        save_video=False)
    frames = result["frames"][0]
    assert frames.shape == (5, 16, 16, 3), frames.shape
    assert frames.dtype == np.uint8

    # determinism
    r2 = gen.generate_video(prompt="a cat  walks", negative_prompt="static",
                            height=16, width=16, num_frames=5,
                            num_inference_steps=2, guidance_scale=4.0,
                            seed=9, save_video=False)
    np.testing.assert_array_equal(frames, r2["frames"][0])
    par.destroy_mesh()


def test_generate_video_longcat_i2v(tmp_path):
    import PIL.Image

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    ckpt = make_tiny_longcat_checkpoint(
        str(tmp_path / "LongCat-Video-I2V-tiny-Diffusers"), i2v=True)
    rng = np.random.default_rng(0)
    img = PIL.Image.fromarray(
        rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8))
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    result = gen.generate_video(
        prompt="w1 w2", pil_image=img, height=16, width=16, num_frames=5,
        num_inference_steps=2, guidance_scale=1.0, seed=4, save_video=False)
    frames = result["frames"][0]
    assert frames.shape == (5, 16, 16, 3)
    assert np.isfinite(result["generation_time"])
    par.destroy_mesh()
