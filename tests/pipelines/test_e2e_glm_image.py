"""End-to-end: tiny GLM-Image checkpoint -> generate_video (T2I with CFG +
glyph prompts; I2I with user-supplied source priors through the KV-cache
write/read path) on CPU."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_glm_image_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("glm_tiny")
    return make_tiny_glm_image_checkpoint(str(root / "GLM-Image-tiny"))


@pytest.fixture(scope="module")
def gen(ckpt):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    g = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    yield g
    par.destroy_mesh()


def test_t2i_cfg_glyph(gen):
    r = gen.generate_video(prompt="a sign saying 'hello'", height=32,
                           width=32, num_inference_steps=4, seed=3,
                           guidance_scale=3.0, save_video=False)
    frames = r["frames"][0]
    assert frames.shape == (1, 32, 32, 3)
    assert frames.dtype == np.uint8
    r2 = gen.generate_video(prompt="a sign saying 'hello'", height=32,
                            width=32, num_inference_steps=4, seed=3,
                            guidance_scale=3.0, save_video=False)
    np.testing.assert_array_equal(frames, r2["frames"][0])


def test_i2i_kv_cache(gen):
    img = np.zeros((32, 32, 3), np.uint8)
    img[8:24, 8:24] = 255
    # stored grid is in d16 units (reference before_denoising.py:254-258
    # doubles the d32 grid): (1, 2, 2) -> cond 32x32, 4 prior tokens
    r = gen.generate_video(prompt="edit it", pil_image=img, height=32,
                           width=32, num_inference_steps=2, seed=5,
                           guidance_scale=2.0, save_video=False,
                           glm_prior_token_id=np.zeros((1, 4), np.int32),
                           glm_prior_token_image_ids=np.zeros(4, np.int32),
                           glm_source_image_grid_thw=[[1, 2, 2]])
    assert r["frames"][0].shape == (1, 32, 32, 3)
