"""End-to-end: tiny FLUX.2 checkpoint -> text-to-image on CPU.

Exercises the Mistral3 text stack (3-layer hidden-state stacking), shared
adaLN modulation + parallel single-stream blocks, empirical-mu flow
sigmas, and the BN-denormalized packed-latent decode (reference
pipelines/basic/flux_2/).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_flux2_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("flux2_tiny")
    return make_tiny_flux2_checkpoint(str(root / "FLUX.2-dev-tiny"))


def test_generate_image_flux2_e2e(ckpt, tmp_path):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    result = gen.generate_video(
        prompt="w1 w2 w3",
        height=32,
        width=32,
        num_frames=1,
        num_inference_steps=4,
        guidance_scale=4.0,  # embedded distilled guidance
        seed=5,
        output_path=str(tmp_path),
        save_video=False,
    )
    frames = result["frames"][0]
    assert frames.shape == (1, 32, 32, 3), frames.shape
    assert frames.dtype == np.uint8

    r2 = gen.generate_video(prompt="w1 w2 w3", height=32, width=32,
                            num_frames=1, num_inference_steps=4,
                            guidance_scale=4.0, seed=5, save_video=False)
    np.testing.assert_array_equal(frames, r2["frames"][0])
    par.destroy_mesh()
