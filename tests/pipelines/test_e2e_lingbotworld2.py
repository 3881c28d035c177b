"""LingBot-World 2 causal-fast e2e: chunked streaming generation with
camera FiLM + first-frame conditioning (reference pipelines/basic/
lingbotworld2/causal_fast_pipeline.py)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_lingbotworld2_checkpoint  # noqa: E402


def _orbit_c2ws(n=9, radius=2.0):
    c2ws = []
    for i in range(n):
        a = 0.2 * i
        c, s = np.cos(a), np.sin(a)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        m[:3, 3] = [radius * s, 0.0, radius * (1 - c)]
        c2ws.append(m)
    return np.stack(c2ws)


def test_lingbotworld2_causal_fast_e2e(tmp_path):
    import PIL.Image

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.entrypoints.video_generator import VideoGenerator

    par.destroy_mesh()
    ckpt = make_tiny_lingbotworld2_checkpoint(
        str(tmp_path / "LingBot-World-V2-14B-Causal-Fast-tiny"))
    rng = np.random.default_rng(0)
    img = PIL.Image.fromarray(
        (rng.random((32, 32, 3)) * 255).astype(np.uint8))

    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    assert type(gen.executor.pipeline).__name__ == \
        "LingBotWorld2CausalFastPipeline"

    # 9 frames -> 5 latent frames; chunk=2 drops the trailing odd frame
    kwargs = dict(prompt="w1 w2", pil_image=img, height=32, width=32,
                  num_frames=9, num_inference_steps=2, guidance_scale=1.0,
                  seed=0, save_video=False)
    result = gen.generate_video(
        **kwargs, extra={"c2ws": _orbit_c2ws(9),
                         "intrinsics": np.array([32, 32, 16, 16],
                                                np.float32)})
    frames = result["frames"][0]
    # 4 latent frames kept -> 7 pixel frames with tr=2
    assert frames.shape[1:] == (32, 32, 3)
    assert frames.shape[0] >= 7
    assert np.isfinite(frames).all()

    plain = gen.generate_video(**kwargs)
    assert np.abs(plain["frames"][0].astype(np.int32) -
                  frames.astype(np.int32)).max() > 0  # camera matters
    par.destroy_mesh()


def test_lingbotworld2_registry():
    from fastvideo_tpu.configs.pipelines.lingbotworld2 import (
        LingBotWorld2CausalFastI2V480PConfig)
    from fastvideo_tpu.registry import get_pipeline_config_cls_for_name

    assert get_pipeline_config_cls_for_name(
        "FastVideo/LingBot-World-V2-14B-Causal-Fast-Diffusers") \
        is LingBotWorld2CausalFastI2V480PConfig
    arch = LingBotWorld2CausalFastI2V480PConfig().dit_config.arch_config
    assert arch.in_channels == 36
    assert arch.local_attn_size == 18 and arch.sink_size == 6
    assert arch.timesteps_index == (0, 250, 500, 750)
