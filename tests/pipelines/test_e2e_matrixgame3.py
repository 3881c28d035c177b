"""End-to-end: tiny Matrix-Game 3.0 checkpoint -> generate_video (first-
frame conditioning + keyboard/mouse action camera control) on CPU."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_matrixgame3_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("mg3_tiny")
    return make_tiny_matrixgame3_checkpoint(str(root / "Matrix-Game-3-tiny"))


@pytest.fixture(scope="module")
def gen(ckpt):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    g = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    yield g
    par.destroy_mesh()


def _first_frame():
    img = np.zeros((32, 32, 3), np.uint8)
    img[8:24, 8:24] = 180
    return img


def test_i2v_action_conditioned(gen):
    kb = np.zeros((57, 6), np.float32)
    kb[:, 0] = 1.0  # hold forward
    mouse = np.zeros((57, 2), np.float32)
    r = gen.generate_video(prompt="explore the world",
                           pil_image=_first_frame(), height=32, width=32,
                           num_frames=57, num_inference_steps=2, seed=3,
                           guidance_scale=1.0, save_video=False,
                           keyboard_cond=kb, mouse_cond=mouse)
    frames = r["frames"][0]
    assert frames.shape == (57, 32, 32, 3)
    assert frames.dtype == np.uint8
    r2 = gen.generate_video(prompt="explore the world",
                            pil_image=_first_frame(), height=32, width=32,
                            num_frames=57, num_inference_steps=2, seed=3,
                            guidance_scale=1.0, save_video=False,
                            keyboard_cond=kb, mouse_cond=mouse)
    np.testing.assert_array_equal(frames, r2["frames"][0])


def test_actions_change_output(gen):
    mouse = np.zeros((57, 2), np.float32)
    kw = dict(prompt="turn", pil_image=_first_frame(), height=32, width=32,
              num_frames=57, num_inference_steps=2, seed=3,
              guidance_scale=1.0, save_video=False, mouse_cond=mouse)
    kb_fwd = np.zeros((57, 6), np.float32)
    kb_fwd[:, 0] = 1.0
    kb_left = np.zeros((57, 6), np.float32)
    kb_left[:, 2] = 1.0
    r1 = gen.generate_video(**kw, keyboard_cond=kb_fwd)
    r2 = gen.generate_video(**kw, keyboard_cond=kb_left)
    assert not np.array_equal(r1["frames"][0], r2["frames"][0])


def test_preset_actions_from_seed(gen):
    # no explicit actions: the preset script is built from the seed
    r = gen.generate_video(prompt="wander", pil_image=_first_frame(),
                           height=32, width=32, num_frames=57,
                           num_inference_steps=2, seed=9,
                           guidance_scale=1.0, save_video=False)
    assert r["frames"][0].shape == (57, 32, 32, 3)
