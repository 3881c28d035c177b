"""End-to-end: tiny HYWorld checkpoint -> generate_video with pose-string
camera/action conditioning and chunked denoising on CPU."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_hyworld_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("hyworld_tiny")
    return make_tiny_hyworld_checkpoint(str(root / "HYWorld-tiny"))


@pytest.fixture(scope="module")
def gen(ckpt):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    g = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    yield g
    par.destroy_mesh()


def _img():
    img = np.zeros((32, 32, 3), np.uint8)
    img[10:22, 10:22] = 160
    return img


def test_pose_string_single_chunk(gen):
    # 55 frames -> 28 latent frames with the tiny 2x VAE; pose has one
    # entry per latent frame (w-27 commands + the initial identity pose)
    r = gen.generate_video(prompt="walk forward", pil_image=_img(),
                           height=32, width=32, num_frames=55,
                           num_inference_steps=2, seed=3,
                           guidance_scale=1.0, save_video=False,
                           pose="w-27", chunk_latent_frames=28)
    frames = r["frames"][0]
    assert frames.dtype == np.uint8
    assert frames.shape[1:] == (32, 32, 3)
    r2 = gen.generate_video(prompt="walk forward", pil_image=_img(),
                            height=32, width=32, num_frames=55,
                            num_inference_steps=2, seed=3,
                            guidance_scale=1.0, save_video=False,
                            pose="w-27", chunk_latent_frames=28)
    np.testing.assert_array_equal(frames, r2["frames"][0])


def test_multi_chunk_with_context(gen):
    # 28 latents / chunk 14 -> 2 chunks; the second chunk prepends
    # FOV-selected context frames at the stabilization timestep
    r = gen.generate_video(prompt="explore", pil_image=_img(), height=32,
                           width=32, num_frames=55, num_inference_steps=2,
                           seed=5, guidance_scale=1.0, save_video=False,
                           pose="w-13,right-14", chunk_latent_frames=14)
    assert r["frames"][0].shape[1:] == (32, 32, 3)


def test_pose_changes_output(gen):
    kw = dict(prompt="look around", pil_image=_img(), height=32, width=32,
              num_frames=55, num_inference_steps=2, seed=3,
              guidance_scale=1.0, save_video=False,
              chunk_latent_frames=28)
    r_fwd = gen.generate_video(**kw, pose="w-27")
    r_rot = gen.generate_video(**kw, pose="right-27")
    assert not np.array_equal(r_fwd["frames"][0], r_rot["frames"][0])
