"""DreamX-World AR (causal forcing) e2e: streaming blocks with causal
PRoPE camera caches (reference pipelines/basic/dreamx_world/
ar_denoising.py + models/dits/dreamx_world_ar.py)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_dreamx_ar_checkpoint  # noqa: E402


def test_dreamx_ar_e2e(tmp_path):
    import PIL.Image

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.entrypoints.video_generator import VideoGenerator

    par.destroy_mesh()
    ckpt = make_tiny_dreamx_ar_checkpoint(
        str(tmp_path / "DreamX-World-5B-AR-tiny"))
    rng = np.random.default_rng(0)
    img = PIL.Image.fromarray(
        (rng.random((32, 32, 3)) * 255).astype(np.uint8))

    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    assert type(gen.executor.pipeline).__name__ == "DreamXWorldARPipeline"

    # 7 frames -> 4 latent frames = 2 AR blocks of 2
    base = dict(prompt="w1 w2", pil_image=img, height=32, width=32,
                num_frames=7, num_inference_steps=2, guidance_scale=1.0,
                seed=0, save_video=False)
    fwd = gen.generate_video(**base, extra={"dreamx_action_seq": ["w"],
                                            "dreamx_action_speed_list": [4]})
    frames = fwd["frames"][0]
    assert frames.shape == (7, 32, 32, 3)
    assert np.isfinite(frames).all()

    # different actions steer the camera branch -> different video
    turned = gen.generate_video(
        **base, extra={"dreamx_action_seq": ["d"],
                       "dreamx_action_speed_list": [8]})
    assert np.abs(turned["frames"][0].astype(np.int32) -
                  frames.astype(np.int32)).max() > 0
    par.destroy_mesh()


def test_dreamx_ar_registry():
    from fastvideo_tpu.configs.pipelines.dreamx_world import (
        DreamXWorld5BARPipelineConfig)
    from fastvideo_tpu.registry import get_pipeline_config_cls_for_name

    assert get_pipeline_config_cls_for_name(
        "AMAP-ML/DreamX-World-5B-AR-Diffusers") \
        is DreamXWorld5BARPipelineConfig
    cfg = DreamXWorld5BARPipelineConfig()
    assert cfg.flow_shift == 5.0
    assert tuple(cfg.dmd_denoising_steps) == (1000, 750, 500, 250)
    arch = cfg.dit_config.arch_config
    assert arch.local_attn_size == 12 and arch.sink_size == 3
    assert arch.attn_compress == 4
