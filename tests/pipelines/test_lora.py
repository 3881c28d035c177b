"""LoRA: adapter load changes output; merge == active; unmerge restores."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_wan_checkpoint  # noqa: E402


def _make_lora_file(path, dim, layers, rank=4, seed=0):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(seed)
    tensors = {}
    for i in range(layers):
        for mod in ("to_q", "to_k", "to_v"):
            # official naming (self_attn.q) exercises lora_param_names_mapping
            off = {"to_q": "q", "to_k": "k", "to_v": "v"}[mod]
            tensors[f"blocks.{i}.self_attn.{off}.lora_A.weight"] = (
                rng.standard_normal((rank, dim)).astype(np.float32) * 0.1)
            tensors[f"blocks.{i}.self_attn.{off}.lora_B.weight"] = (
                rng.standard_normal((dim, rank)).astype(np.float32) * 0.1)
    save_file(tensors, path)
    return path


def test_lora_apply_merge_unmerge(tmp_path):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    ckpt = make_tiny_wan_checkpoint(str(tmp_path / "Wan-tiny"))
    lora_path = _make_lora_file(str(tmp_path / "adapter.safetensors"),
                                dim=64, layers=2)
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    kwargs = dict(prompt="w1 w2", height=16, width=16, num_frames=3,
                  num_inference_steps=1, guidance_scale=1.0, seed=3,
                  save_video=False)
    base = gen.generate_video(**kwargs)["frames"][0]

    gen.executor.pipeline.set_lora_adapter("test", lora_path)
    lora_out = gen.generate_video(**kwargs)["frames"][0]
    assert np.abs(base.astype(int) - lora_out.astype(int)).max() > 0

    gen.executor.pipeline.merge_lora_weights()
    merged_out = gen.generate_video(**kwargs)["frames"][0]
    # merged (W+BA in bf16 weights) vs adapter (x@W + x@A@B in bf16
    # activations) differ by a few uint8 levels of rounding only
    assert np.abs(merged_out.astype(int) - lora_out.astype(int)).max() <= 8

    gen.executor.pipeline.unmerge_lora_weights()
    # after unmerge the lora path is active again (unmerged math == merged)
    unmerged_out = gen.generate_video(**kwargs)["frames"][0]
    assert np.abs(unmerged_out.astype(int) - lora_out.astype(int)).max() <= 8
