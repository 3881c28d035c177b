"""LingBot-World I2V end-to-end: Plücker camera FiLM conditioning
(reference pipelines/basic/lingbotworld/ + models/dits/lingbotworld/)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_lingbotworld_checkpoint  # noqa: E402


def _orbit_c2ws(n=9, radius=2.0):
    c2ws = []
    for i in range(n):
        a = 0.15 * i
        c, s = np.cos(a), np.sin(a)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        m[:3, 3] = [radius * s, 0.0, radius * (1 - c)]
        c2ws.append(m)
    return np.stack(c2ws)


def test_camera_condition_shapes():
    from fastvideo_tpu.pipelines.basic.lingbotworld.camera import (
        build_plucker_condition, compute_relative_poses)

    c2ws = _orbit_c2ws(9)
    rel = compute_relative_poses(c2ws.copy(), framewise=True)
    np.testing.assert_allclose(rel[0], np.eye(4), atol=1e-6)

    cond = build_plucker_condition(c2ws, np.array([32, 32, 16, 16],
                                                  np.float32),
                                   num_frames=9, height=32, width=32,
                                   spatial_scale=2, temporal_scale=2)
    # (9-1)//2+1 = 5 latent frames; 6 * 2*2 = 24 channels; 16x16 grid
    assert cond.shape == (1, 24, 5, 16, 16)
    assert np.isfinite(cond).all()


def test_lingbotworld_i2v_camera_changes_output(tmp_path):
    import PIL.Image

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.entrypoints.video_generator import VideoGenerator

    par.destroy_mesh()
    ckpt = make_tiny_lingbotworld_checkpoint(
        str(tmp_path / "LingBot-World-Base-Cam-tiny"))
    rng = np.random.default_rng(0)
    img = PIL.Image.fromarray(
        (rng.random((32, 32, 3)) * 255).astype(np.uint8))

    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    assert type(gen.executor.pipeline).__name__ == \
        "LingBotWorldImageToVideoPipeline"

    kwargs = dict(prompt="w1 w2", pil_image=img, height=32, width=32,
                  num_frames=9, num_inference_steps=2, guidance_scale=1.0,
                  seed=0, save_video=False)
    plain = gen.generate_video(**kwargs)
    moved = gen.generate_video(**kwargs,
                               extra={"c2ws": _orbit_c2ws(9),
                                      "intrinsics": np.array(
                                          [32, 32, 16, 16], np.float32)})
    frames = moved["frames"][0]
    assert frames.shape == (9, 32, 32, 3)
    assert np.isfinite(frames).all()
    # camera conditioning must alter the generation
    assert np.abs(frames.astype(np.int32) -
                  plain["frames"][0].astype(np.int32)).max() > 0
    par.destroy_mesh()


def test_lingbotworld_registry():
    from fastvideo_tpu.configs.pipelines.lingbotworld import (
        LingBotWorldI2V480PConfig)
    from fastvideo_tpu.registry import get_pipeline_config_cls_for_name

    assert get_pipeline_config_cls_for_name(
        "FastVideo/LingBot-World-Base-Cam-Diffusers") \
        is LingBotWorldI2V480PConfig
    cfg = LingBotWorldI2V480PConfig()
    assert cfg.boundary_ratio == pytest.approx(0.947)
    assert cfg.flow_shift == 10.0
