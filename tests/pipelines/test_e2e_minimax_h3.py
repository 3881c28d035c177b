"""End-to-end: tiny MiniMax-H3 checkpoint -> generate_video (joint video +
stereo audio, T2VA and FL2VA keyframe latent conditioning) on CPU."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_minimax_h3_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("minimax_tiny")
    return make_tiny_minimax_h3_checkpoint(str(root / "MiniMax-H3-tiny"))


@pytest.fixture(scope="module")
def gen(ckpt):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    g = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    yield g
    par.destroy_mesh()


def test_t2va_joint_generation(gen):
    r = gen.generate_video(prompt="w1 w2 w3", height=32, width=32,
                           num_frames=124, num_inference_steps=2, seed=7,
                           guidance_scale=1.0, negative_prompt="",
                           save_video=False)
    frames = r["frames"][0]
    assert frames.shape == (124, 32, 32, 3)
    assert frames.dtype == np.uint8
    audio = r["audio"]
    # 124 frames @ 24fps * 40 latents/s = 207 latents * hop 4 = 828 samples
    assert audio.shape == (828, 2)
    assert r["audio_sample_rate"] == 32000
    assert np.abs(audio).max() <= 1.0

    r2 = gen.generate_video(prompt="w1 w2 w3", height=32, width=32,
                            num_frames=124, num_inference_steps=2, seed=7,
                            guidance_scale=1.0, negative_prompt="",
                            save_video=False)
    np.testing.assert_array_equal(frames, r2["frames"][0])
    np.testing.assert_allclose(audio, r2["audio"], atol=1e-5)


def test_rejects_cfg(gen):
    with pytest.raises(Exception, match="guidance"):
        gen.generate_video(prompt="w1", height=32, width=32,
                           num_frames=124, num_inference_steps=2,
                           guidance_scale=5.0, negative_prompt="",
                           save_video=False)


def test_frame_alignment_applied(gen):
    # 121 frames aligns up to 124 (17n+5 form)
    r = gen.generate_video(prompt="w4", height=32, width=32,
                           num_frames=121, num_inference_steps=2, seed=1,
                           guidance_scale=1.0, negative_prompt="",
                           save_video=False)
    assert r["frames"][0].shape[0] == 124
