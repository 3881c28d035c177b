"""End-to-end: tiny Cosmos-Predict2.5 checkpoint on CPU.

Exercises Reason1 full-concat text encoding (every hidden state stacked
on features), the AdaLN-LoRA DiT with condition/padding mask channels,
Karras flow-match sigmas, Wan VAE decode (reference pipelines/basic/
cosmos/cosmos2_5_pipeline.py)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_cosmos25_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("cosmos25_tiny")
    return make_tiny_cosmos25_checkpoint(
        str(root / "Cosmos-Predict2.5-2B-tiny"))


def test_generate_video_cosmos25_e2e(ckpt, tmp_path):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    result = gen.generate_video(
        prompt="w1 w2",
        height=32,
        width=32,
        num_frames=5,
        num_inference_steps=3,
        guidance_scale=1.0,
        seed=4,
        output_path=str(tmp_path),
        save_video=False,
    )
    frames = result["frames"][0]
    assert frames.shape == (5, 32, 32, 3)
    assert frames.dtype == np.uint8
    par.destroy_mesh()
