"""End-to-end: tiny Stable Audio Open checkpoint -> generate_video (T2A,
A2A variation, RePaint inpainting) on CPU."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_stable_audio_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("sa_tiny")
    return make_tiny_stable_audio_checkpoint(
        str(root / "stable-audio-open-tiny-Diffusers"))


@pytest.fixture(scope="module")
def gen(ckpt):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    g = VideoGenerator.from_pretrained(ckpt, num_gpus=1, sample_size=1600,
                                       sampling_rate=400,
                                       audio_end_in_s=2.0)
    yield g
    par.destroy_mesh()


def test_t2a(gen, tmp_path):
    r = gen.generate_video(prompt="w1 w2", num_inference_steps=4, seed=3,
                           guidance_scale=3.0, save_video=True,
                           output_path=str(tmp_path),
                           output_video_name="clip")
    audio = r["audio"]
    # 2.0s at 400 Hz stereo
    assert audio.shape == (800, 2), audio.shape
    assert np.isfinite(audio).all()
    assert r["audio_sample_rate"] == 400
    assert os.path.exists(r["audio_path"])
    # determinism
    r2 = gen.generate_video(prompt="w1 w2", num_inference_steps=4, seed=3,
                            guidance_scale=3.0, save_video=False)
    np.testing.assert_allclose(audio, r2["audio"], atol=1e-5)


def test_a2a_variation(gen):
    ref = np.sin(np.linspace(0, 40, 800, dtype=np.float32))[None, :]
    r = gen.generate_video(prompt="w1", num_inference_steps=4, seed=5,
                           guidance_scale=1.0, save_video=False,
                           init_audio=ref, init_audio_strength=0.2)
    assert r["audio"].shape == (800, 2)
    assert np.isfinite(r["audio"]).all()


def test_inpaint(gen):
    ref = np.zeros((2, 1600), np.float32)
    r = gen.generate_video(prompt="w1", num_inference_steps=4, seed=7,
                           guidance_scale=1.0, save_video=False,
                           inpaint_audio=ref, inpaint_mask=(1.0, 4.0))
    assert r["audio"].shape == (800, 2)
    assert np.isfinite(r["audio"]).all()


def test_inpaint_requires_mask(gen):
    ref = np.zeros((2, 1600), np.float32)
    with pytest.raises(Exception):
        gen.generate_video(prompt="w1", num_inference_steps=2, seed=7,
                           save_video=False, inpaint_audio=ref)
