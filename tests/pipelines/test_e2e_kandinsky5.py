"""End-to-end: tiny Kandinsky-5.0 checkpoint -> VideoGenerator on CPU.

Exercises the Qwen2.5 template crop (token 129), CLIP pooled stream into
the time embedding, text-refiner transformer blocks, visual decoder
blocks (self+cross attention), and the HunyuanVideo VAE decode
(reference pipelines/basic/kandinsky5/).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_kandinsky5_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("k5_tiny")
    return make_tiny_kandinsky5_checkpoint(
        str(root / "Kandinsky-5.0-T2V-Lite-tiny"))


def test_generate_video_kandinsky5_e2e(ckpt, tmp_path):
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
        seed=3,
        output_path=str(tmp_path),
        save_video=True,
    )
    frames = result["frames"][0]
    assert frames.shape == (5, 32, 32, 3), frames.shape
    assert frames.dtype == np.uint8

    r2 = gen.generate_video(prompt="w1 w2 w3", height=32, width=32,
                            num_frames=5, num_inference_steps=3,
                            guidance_scale=1.0, seed=3, save_video=False)
    np.testing.assert_array_equal(frames, r2["frames"][0])
    par.destroy_mesh()
