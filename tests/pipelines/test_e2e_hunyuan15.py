"""End-to-end: tiny HunyuanVideo-1.5 checkpoint -> VideoGenerator on CPU.

Exercises the dual text streams (Qwen2.5 video-description template with
hidden-state -3 crop + ByT5 glyph stream), the always-on [z+1]-channel
condition concat (zeros for T2V), FlowMatchEuler shift-5 denoising, and
the DCAE pixel-shuffle VAE decode. I2V adds SigLIP embeds + a first-frame
VAE latent condition (reference pipelines/basic/hunyuan15/).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_hunyuan15_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("hy15_tiny")
    return make_tiny_hunyuan15_checkpoint(
        str(root / "HunyuanVideo-1.5-tiny-Diffusers"))


def test_generate_video_hunyuan15_t2v(ckpt, tmp_path):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    result = gen.generate_video(
        prompt='w1 w2 "w3"',
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
    r2 = gen.generate_video(prompt='w1 w2 "w3"', height=32, width=32,
                            num_frames=5, num_inference_steps=3,
                            guidance_scale=1.0, seed=11, save_video=False)
    np.testing.assert_array_equal(frames, r2["frames"][0])
    par.destroy_mesh()


def test_generate_video_hunyuan15_sr(tmp_path):
    """Two-pass SR: base denoise at 16x16, SR refinement at 32x32 on
    transformer_2 conditioned on the upsampled low-res latents."""
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    ckpt = make_tiny_hunyuan15_checkpoint(
        str(tmp_path / "HunyuanVideo-1.5-SR-tiny-Diffusers"), sr=True)
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    result = gen.generate_video(
        prompt="w1 w2", height=16, width=16, height_sr=32, width_sr=32,
        num_frames=5, num_inference_steps=2, num_inference_steps_sr=3,
        guidance_scale=1.0, seed=3, save_video=False)
    frames = result["frames"][0]
    # output geometry follows the SR grid
    assert frames.shape == (5, 32, 32, 3), frames.shape
    assert np.isfinite(frames.astype(np.float32)).all()
    par.destroy_mesh()


def test_generate_video_hunyuan15_i2v(tmp_path):
    import PIL.Image

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    ckpt = make_tiny_hunyuan15_checkpoint(
        str(tmp_path / "HunyuanVideo-1.5-I2V-tiny-Diffusers"), i2v=True)
    rng = np.random.default_rng(0)
    img = PIL.Image.fromarray(
        rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8))
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    result = gen.generate_video(
        prompt="w1 w2", pil_image=img, height=32, width=32, num_frames=5,
        num_inference_steps=2, guidance_scale=1.0, seed=7, save_video=False)
    frames = result["frames"][0]
    assert frames.shape == (5, 32, 32, 3)
    assert np.isfinite(result["generation_time"])
    par.destroy_mesh()
