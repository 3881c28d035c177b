"""Wan V2V + Lucy Edit end-to-end on tiny checkpoints (reference
pipelines/basic/wan/wan_v2v_pipeline.py, lucy_edit_pipeline.py)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import (make_tiny_lucy_edit_checkpoint,  # noqa: E402
                   make_tiny_wan_v2v_checkpoint)


def _control_video(tmp_path, t=9, h=32, w=32):
    rng = np.random.default_rng(0)
    frames = (rng.random((t, h, w, 3)) * 255).astype(np.uint8)
    path = str(tmp_path / "control.npy")
    np.save(path, frames)
    return path, frames


@pytest.mark.parametrize("maker,cls_name,in_mult", [
    (make_tiny_lucy_edit_checkpoint, "LucyEditPipeline", 2),
    (make_tiny_wan_v2v_checkpoint, "WanVideoToVideoPipeline", 3),
])
def test_v2v_generates(tmp_path, maker, cls_name, in_mult):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.entrypoints.video_generator import VideoGenerator

    par.destroy_mesh()
    name = ("Lucy-Edit-Dev-tiny" if "Lucy" in cls_name
            else "Wan2.1-V2V-tiny-Diffusers")
    ckpt = maker(str(tmp_path / name))
    video_path, _ = _control_video(tmp_path)

    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    assert type(gen.executor.pipeline).__name__ == cls_name

    result = gen.generate_video(
        prompt="repaint the sky purple", video_path=video_path,
        height=32, width=32, num_frames=9, num_inference_steps=2,
        guidance_scale=1.0, seed=0, save_video=False)
    frames = result["frames"]
    assert frames[0].shape == (9, 32, 32, 3)
    assert np.isfinite(frames[0]).all()

    # control latent was built and concatenated: re-run with a different
    # control video changes the output
    other = np.zeros((9, 32, 32, 3), np.uint8)
    other_path = str(tmp_path / "other.npy")
    np.save(other_path, other)
    result2 = gen.generate_video(
        prompt="repaint the sky purple", video_path=other_path,
        height=32, width=32, num_frames=9, num_inference_steps=2,
        guidance_scale=1.0, seed=0, save_video=False)
    assert np.abs(result2["frames"][0].astype(np.int32) -
                  frames[0].astype(np.int32)).max() > 0
    par.destroy_mesh()


def test_v2v_config_detection():
    from fastvideo_tpu.configs.pipelines.wan import (LucyEditDevConfig,
                                                     WanV2VConfig)
    from fastvideo_tpu.registry import get_pipeline_config_cls_for_name

    assert get_pipeline_config_cls_for_name(
        "decart-ai/Lucy-Edit-Dev") is LucyEditDevConfig
    assert get_pipeline_config_cls_for_name(
        "decart-ai/Lucy-Edit-1.1-Dev") is LucyEditDevConfig
    assert get_pipeline_config_cls_for_name(
        "Wan-AI/Wan2.1-V2V-14B") is WanV2VConfig
    cfg = LucyEditDevConfig()
    assert cfg.lucy_edit_task and not cfg.ti2v_task


def test_lucy_preset():
    from fastvideo_tpu.api.presets import get_preset

    preset = get_preset("wan", "lucy_edit_dev")
    assert preset.defaults["height"] == 480
    assert preset.defaults["width"] == 832
    assert preset.defaults["num_frames"] == 81
    assert preset.defaults["fps"] == 24
    assert preset.defaults["guidance_scale"] == 5.0
