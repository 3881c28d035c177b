"""End-to-end: tiny LingBot-Video checkpoint -> generate_video (chat
template conditioning + CFG joint video-text DiT) on CPU."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_lingbot_video_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("lbv_tiny")
    return make_tiny_lingbot_video_checkpoint(
        str(root / "LingBot-Video-tiny"))


@pytest.fixture(scope="module")
def gen(ckpt):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    g = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    yield g
    par.destroy_mesh()


def test_t2v_cfg(gen):
    r = gen.generate_video(prompt="a red ball bouncing", height=16,
                           width=16, num_frames=9, num_inference_steps=2,
                           seed=11, guidance_scale=3.0,
                           negative_prompt="blurry", save_video=False)
    frames = r["frames"][0]
    assert frames.shape == (9, 16, 16, 3)
    assert frames.dtype == np.uint8
    r2 = gen.generate_video(prompt="a red ball bouncing", height=16,
                            width=16, num_frames=9, num_inference_steps=2,
                            seed=11, guidance_scale=3.0,
                            negative_prompt="blurry", save_video=False)
    np.testing.assert_array_equal(frames, r2["frames"][0])


def test_t2v_no_cfg(gen):
    r = gen.generate_video(prompt="a blue cube", height=16, width=16,
                           num_frames=9, num_inference_steps=2, seed=4,
                           guidance_scale=1.0, save_video=False)
    assert r["frames"][0].shape == (9, 16, 16, 3)
