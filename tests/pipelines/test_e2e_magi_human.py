"""End-to-end: tiny daVinci-MagiHuman checkpoint -> generate_video (joint
packed audio-video denoise with CFG=2) on CPU."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_magi_human_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("magi_tiny")
    return make_tiny_magi_human_checkpoint(str(root / "MagiHuman-tiny"))


@pytest.fixture(scope="module")
def gen(ckpt):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    g = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    yield g
    par.destroy_mesh()


def test_t2av_cfg2(gen):
    r = gen.generate_video(prompt="a person talking", height=32, width=32,
                           num_frames=9, num_inference_steps=2, seed=3,
                           guidance_scale=5.0, negative_prompt="bad",
                           save_video=False)
    frames = r["frames"][0]
    assert frames.shape == (9, 32, 32, 3)
    assert frames.dtype == np.uint8
    audio = r["audio"]
    # 9 audio-latent frames * hop 4 samples, stretched by 441/512
    assert audio.ndim == 2 and audio.shape[1] == 2
    assert audio.shape[0] == int(9 * 4 * 441.0 / 512.0)
    r2 = gen.generate_video(prompt="a person talking", height=32, width=32,
                            num_frames=9, num_inference_steps=2, seed=3,
                            guidance_scale=5.0, negative_prompt="bad",
                            save_video=False)
    np.testing.assert_array_equal(frames, r2["frames"][0])


def test_t2av_no_cfg(gen):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    # cfg_number=1 path: no negative prompt required
    par.destroy_mesh()
    g = VideoGenerator.from_pretrained(gen.fastvideo_args.model_path,
                                       num_gpus=1, cfg_number=1)
    r = g.generate_video(prompt="music", height=32, width=32, num_frames=9,
                         num_inference_steps=2, seed=4, guidance_scale=1.0,
                         save_video=False)
    assert r["frames"][0].shape == (9, 32, 32, 3)
    par.destroy_mesh()
