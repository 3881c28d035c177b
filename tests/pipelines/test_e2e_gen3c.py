"""End-to-end: tiny GEN3C checkpoint -> generate_video with 3D-cache
camera-trajectory conditioning (depth-provided, forward-warped) on CPU."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_gen3c_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("gen3c_tiny")
    return make_tiny_gen3c_checkpoint(str(root / "GEN3C-tiny"))


@pytest.fixture(scope="module")
def gen(ckpt):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    g = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    yield g
    par.destroy_mesh()


def _img():
    img = np.zeros((16, 16, 3), np.uint8)
    img[4:12, 4:12] = 200
    return img


def test_i2v_camera_trajectory(gen):
    depth = np.full((16, 16), 2.0, np.float32)
    r = gen.generate_video(prompt="orbit the object", pil_image=_img(),
                           height=16, width=16, num_frames=9,
                           num_inference_steps=2, seed=3,
                           guidance_scale=1.0, save_video=False,
                           gen3c_depth=depth, trajectory_type="left",
                           movement_distance=0.3)
    frames = r["frames"][0]
    assert frames.shape == (9, 16, 16, 3)
    assert frames.dtype == np.uint8
    r2 = gen.generate_video(prompt="orbit the object", pil_image=_img(),
                            height=16, width=16, num_frames=9,
                            num_inference_steps=2, seed=3,
                            guidance_scale=1.0, save_video=False,
                            gen3c_depth=depth, trajectory_type="left",
                            movement_distance=0.3)
    np.testing.assert_array_equal(frames, r2["frames"][0])


def test_trajectory_changes_output(gen):
    depth = np.full((16, 16), 2.0, np.float32)
    kw = dict(prompt="move", pil_image=_img(), height=16, width=16,
              num_frames=9, num_inference_steps=2, seed=3,
              guidance_scale=1.0, save_video=False, gen3c_depth=depth,
              movement_distance=0.5)
    r_left = gen.generate_video(**kw, trajectory_type="left")
    r_zoom = gen.generate_video(**kw, trajectory_type="zoom_in")
    assert not np.array_equal(r_left["frames"][0], r_zoom["frames"][0])


def test_t2v_zero_conditioning(gen):
    r = gen.generate_video(prompt="a field", height=16, width=16,
                           num_frames=9, num_inference_steps=2, seed=1,
                           guidance_scale=1.0, save_video=False)
    assert r["frames"][0].shape == (9, 16, 16, 3)
