"""End-to-end: tiny Z-Image checkpoint -> VideoGenerator on CPU.

Exercises the Qwen3 hidden-state -2 conditioning, the (1000-t)/1000
timestep convention with a NEGATED flow prediction, pos+g*(pos-neg) CFG,
and AutoencoderKL decode (reference pipelines/basic/zimage/)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_zimage_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("zimage_tiny")
    return make_tiny_zimage_checkpoint(str(root / "Z-Image-tiny-Diffusers"))


def test_generate_image_zimage(ckpt, tmp_path):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    result = gen.generate_video(
        prompt="a red square", negative_prompt="blurry",
        height=32, width=32, num_frames=1, num_inference_steps=3,
        guidance_scale=3.5, seed=5, output_path=str(tmp_path),
        save_video=False)
    frames = result["frames"][0]
    assert frames.shape == (1, 32, 32, 3), frames.shape
    assert frames.dtype == np.uint8

    # determinism
    r2 = gen.generate_video(prompt="a red square", negative_prompt="blurry",
                            height=32, width=32, num_frames=1,
                            num_inference_steps=3, guidance_scale=3.5,
                            seed=5, save_video=False)
    np.testing.assert_array_equal(frames, r2["frames"][0])
    par.destroy_mesh()
