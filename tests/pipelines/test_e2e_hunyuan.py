"""End-to-end: tiny HunyuanVideo checkpoint -> VideoGenerator on CPU.

Exercises dual text encoders (LLaMA chat template + CLIP pooled),
embedded distilled guidance, FlowMatchEuler denoising, Hunyuan VAE decode.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_hunyuan_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("hy_tiny")
    return make_tiny_hunyuan_checkpoint(
        str(root / "HunyuanVideo-tiny-Diffusers"))


def test_generate_video_hunyuan_e2e(ckpt, tmp_path):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    result = gen.generate_video(
        prompt="w1 w2 w3",
        height=32,
        width=32,
        num_frames=5,
        num_inference_steps=3,
        guidance_scale=1.0,
        seed=11,
        output_path=str(tmp_path),
        save_video=True,
    )
    frames = result["frames"][0]
    assert frames.shape == (5, 32, 32, 3), frames.shape
    assert frames.dtype == np.uint8

    # determinism
    r2 = gen.generate_video(prompt="w1 w2 w3", height=32, width=32,
                            num_frames=5, num_inference_steps=3,
                            guidance_scale=1.0, seed=11, save_video=False)
    np.testing.assert_array_equal(frames, r2["frames"][0])
    par.destroy_mesh()
