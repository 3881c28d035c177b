"""End-to-end I2V: tiny Wan I2V checkpoint with CLIP + first-frame VAE cond."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_wan_i2v_checkpoint  # noqa: E402


def test_generate_i2v(tmp_path):
    import PIL.Image

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    ckpt = make_tiny_wan_i2v_checkpoint(
        str(tmp_path / "Wan2.1-I2V-tiny-Diffusers"))
    rng = np.random.default_rng(0)
    img = PIL.Image.fromarray(
        rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8))
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    result = gen.generate_video(
        prompt="w1 w2", pil_image=img, height=32, width=32, num_frames=5,
        num_inference_steps=2, guidance_scale=1.0, seed=11,
        save_video=False)
    frames = result["frames"][0]
    assert frames.shape == (5, 32, 32, 3)
    assert np.isfinite(result["generation_time"])
