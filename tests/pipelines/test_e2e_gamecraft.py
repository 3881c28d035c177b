"""End-to-end: tiny HunyuanGameCraft checkpoint -> VideoGenerator on CPU.

Exercises the camera/action conditioning path: a WASD action string is
turned into Plücker-coordinate camera states (models/camera/trajectory),
encoded by the CameraNet, and added to the image tokens; the model input
is the 9-channel [latent | gt | mask] concat
(reference pipelines/basic/gamecraft/ + stages/gamecraft_denoising.py).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_hunyuan_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("gamecraft_tiny")
    return make_tiny_hunyuan_checkpoint(
        str(root / "HunyuanGameCraft-tiny-Diffusers"), gamecraft=True)


def test_generate_video_gamecraft_action(ckpt, tmp_path):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    result = gen.generate_video(
        prompt="a walk in the park",
        action="w",
        action_speed=0.25,
        height=32,
        width=32,
        num_frames=5,
        num_inference_steps=2,
        guidance_scale=1.0,
        seed=5,
        output_path=str(tmp_path),
        save_video=False,
    )
    frames = result["frames"][0]
    assert frames.shape == (5, 32, 32, 3), frames.shape
    assert frames.dtype == np.uint8

    # a different action must change the output (camera conditioning is live)
    r2 = gen.generate_video(prompt="a walk in the park", action="left_rot",
                            action_speed=0.25, height=32, width=32,
                            num_frames=5, num_inference_steps=2,
                            guidance_scale=1.0, seed=5, save_video=False)
    assert not np.array_equal(frames, r2["frames"][0])
    par.destroy_mesh()


def test_generate_video_gamecraft_cfg(ckpt):
    """CFG path: negative prompt + guidance_scale > 1."""
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    result = gen.generate_video(
        prompt="a walk", negative_prompt="blurry", action="s",
        height=32, width=32, num_frames=5, num_inference_steps=2,
        guidance_scale=3.0, seed=2, save_video=False)
    frames = result["frames"][0]
    assert frames.shape == (5, 32, 32, 3)
    assert np.isfinite(result["generation_time"])
    par.destroy_mesh()
