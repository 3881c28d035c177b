"""Matrix-Game 2.0 I2V e2e: CLIP image conditioning + keyboard/mouse
action attention (reference pipelines/basic/matrixgame2/
matrixgame2_i2v_pipeline.py)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_matrixgame2_checkpoint  # noqa: E402


def test_matrixgame2_i2v_actions_steer(tmp_path):
    import PIL.Image

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.entrypoints.video_generator import VideoGenerator

    par.destroy_mesh()
    ckpt = make_tiny_matrixgame2_checkpoint(
        str(tmp_path / "Matrix-Game-2.0-tiny"))
    rng = np.random.default_rng(0)
    img = PIL.Image.fromarray(
        (rng.random((32, 32, 3)) * 255).astype(np.uint8))

    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    assert type(gen.executor.pipeline).__name__ == "MatrixGame2I2VPipeline"

    f = 9
    base = dict(prompt="", pil_image=img, height=32, width=32,
                num_frames=f, num_inference_steps=2, guidance_scale=1.0,
                seed=0, save_video=False)
    idle = gen.generate_video(**base)
    frames = idle["frames"][0]
    assert frames.shape == (f, 32, 32, 3)
    assert np.isfinite(frames).all()

    kb = np.zeros((f, 4), np.float32)
    kb[:, 0] = 1.0  # hold "forward"
    mouse = np.tile(np.array([0.2, -0.1], np.float32), (f, 1))
    moved = gen.generate_video(
        **base, extra={"keyboard_cond": kb, "mouse_cond": mouse})
    assert np.abs(moved["frames"][0].astype(np.int32) -
                  frames.astype(np.int32)).max() > 0


def test_matrixgame2_registry():
    from fastvideo_tpu.configs.pipelines.matrixgame2 import (
        MatrixGame2I2VConfig)
    from fastvideo_tpu.registry import get_pipeline_config_cls_for_name

    assert get_pipeline_config_cls_for_name(
        "Skywork/Matrix-Game-2.0-Diffusers") is MatrixGame2I2VConfig
    arch = MatrixGame2I2VConfig().dit_config.arch_config
    assert arch.image_dim == 1280
    assert arch.action_config["keyboard_dim_in"] == 4
    assert arch.action_config["img_hidden_size"] == 1536
