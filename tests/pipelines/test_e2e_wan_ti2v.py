"""Wan2.2 TI2V: first-frame latent replacement + per-token timesteps.

The conditioned latent frame 0 must be the VAE-encoded image (invariant
across seeds) while the generated frames vary with the seed.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_wan_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("wan_ti2v")
    # path name selects Wan2_2_TI2V_5B_Config (ti2v_task=True)
    return make_tiny_wan_checkpoint(str(root / "Wan2.2-TI2V-tiny-Diffusers"))


def test_ti2v_first_frame_conditioning(ckpt):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)

    kwargs = dict(prompt="w1 w2", height=32, width=32, num_frames=5,
                  num_inference_steps=2, guidance_scale=1.0,
                  pil_image=image, save_video=False)
    r1 = gen.generate_video(seed=3, **kwargs)
    r2 = gen.generate_video(seed=99, **kwargs)

    lat1 = np.asarray(r1["latents"])
    lat2 = np.asarray(r2["latents"])
    # conditioned frame identical across seeds; generated frames differ
    np.testing.assert_array_equal(lat1[:, :, 0], lat2[:, :, 0])
    assert np.abs(lat1[:, :, 1:] - lat2[:, :, 1:]).max() > 1e-3

    frames = r1["frames"][0]
    assert frames.shape == (5, 32, 32, 3)
    par.destroy_mesh()
