"""End-to-end: tiny DreamX-World-5B-Cam checkpoint -> generate_video with
WASD camera-action conditioning (PRoPE) on CPU."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_dreamx_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("dreamx_tiny")
    return make_tiny_dreamx_checkpoint(str(root / "DreamX-World-5B-Cam"))


@pytest.fixture(scope="module")
def gen(ckpt):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    g = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    yield g
    par.destroy_mesh()


def test_camera_conditioned_t2v(gen):
    r = gen.generate_video(prompt="a walk through a forest", height=16,
                           width=16, num_frames=9, num_inference_steps=2,
                           seed=3, guidance_scale=1.0, save_video=False,
                           dreamx_action_seq=["w", "wd"],
                           dreamx_action_speed_list=[4, 2])
    frames = r["frames"][0]
    assert frames.shape == (9, 16, 16, 3)
    assert frames.dtype == np.uint8
    r2 = gen.generate_video(prompt="a walk through a forest", height=16,
                            width=16, num_frames=9, num_inference_steps=2,
                            seed=3, guidance_scale=1.0, save_video=False,
                            dreamx_action_seq=["w", "wd"],
                            dreamx_action_speed_list=[4, 2])
    np.testing.assert_array_equal(frames, r2["frames"][0])


def test_camera_actions_change_output(gen):
    kw = dict(prompt="pan", height=16, width=16, num_frames=9,
              num_inference_steps=2, seed=3, guidance_scale=1.0,
              save_video=False)
    r_fwd = gen.generate_video(**kw, dreamx_action_seq=["w"],
                               dreamx_action_speed_list=[8])
    r_rot = gen.generate_video(**kw, dreamx_action_seq=["j"],
                               dreamx_action_speed_list=[8])
    assert not np.array_equal(r_fwd["frames"][0], r_rot["frames"][0])


def test_ti2v_first_frame_conditioning(gen):
    img = np.zeros((16, 16, 3), np.uint8)
    img[4:12, 4:12] = 200
    r = gen.generate_video(prompt="continue", pil_image=img, height=16,
                           width=16, num_frames=9, num_inference_steps=2,
                           seed=5, guidance_scale=1.0, save_video=False)
    assert r["frames"][0].shape == (9, 16, 16, 3)
