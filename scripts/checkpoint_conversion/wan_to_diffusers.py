#!/usr/bin/env python3
"""Convert original Wan-release DiT checkpoints to the diffusers layout.

Key table mirrors /root/reference/scripts/checkpoint_conversion/
wan_to_diffusers.py:8-70 (text/time embedders, per-block attn1/attn2/ffn
renames, scale_shift_table). Works on safetensors or .pt inputs; output
is the ``transformer/diffusion_pytorch_model.safetensors`` our component
loader consumes.

Usage:
    python scripts/checkpoint_conversion/wan_to_diffusers.py \
        in.safetensors out.safetensors
"""

from __future__ import annotations

import argparse
import re

WAN_TO_DIFFUSERS: dict[str, str] = {
    r"^text_embedding\.0\.(.*)$":
    r"condition_embedder.text_embedder.linear_1.\1",
    r"^text_embedding\.2\.(.*)$":
    r"condition_embedder.text_embedder.linear_2.\1",
    r"^time_embedding\.0\.(.*)$":
    r"condition_embedder.time_embedder.linear_1.\1",
    r"^time_embedding\.2\.(.*)$":
    r"condition_embedder.time_embedder.linear_2.\1",
    r"^time_projection\.1\.(.*)$": r"condition_embedder.time_proj.\1",
    r"^img_emb\.proj\.0\.(.*)$":
    r"condition_embedder.image_embedder.norm1.\1",
    r"^img_emb\.proj\.1\.(.*)$":
    r"condition_embedder.image_embedder.ff.net.0.proj.\1",
    r"^img_emb\.proj\.3\.(.*)$":
    r"condition_embedder.image_embedder.ff.net.2.\1",
    r"^img_emb\.proj\.4\.(.*)$":
    r"condition_embedder.image_embedder.norm2.\1",
    r"^head\.modulation": r"scale_shift_table",
    r"^head\.head\.(.*)$": r"proj_out.\1",
    r"^blocks\.(\d+)\.self_attn\.q\.(.*)$": r"blocks.\1.attn1.to_q.\2",
    r"^blocks\.(\d+)\.self_attn\.k\.(.*)$": r"blocks.\1.attn1.to_k.\2",
    r"^blocks\.(\d+)\.self_attn\.v\.(.*)$": r"blocks.\1.attn1.to_v.\2",
    r"^blocks\.(\d+)\.self_attn\.o\.(.*)$": r"blocks.\1.attn1.to_out.0.\2",
    r"^blocks\.(\d+)\.self_attn\.norm_q\.(.*)$":
    r"blocks.\1.attn1.norm_q.\2",
    r"^blocks\.(\d+)\.self_attn\.norm_k\.(.*)$":
    r"blocks.\1.attn1.norm_k.\2",
    r"^blocks\.(\d+)\.cross_attn\.q\.(.*)$": r"blocks.\1.attn2.to_q.\2",
    r"^blocks\.(\d+)\.cross_attn\.k\.(.*)$": r"blocks.\1.attn2.to_k.\2",
    r"^blocks\.(\d+)\.cross_attn\.k_img\.(.*)$":
    r"blocks.\1.attn2.add_k_proj.\2",
    r"^blocks\.(\d+)\.cross_attn\.v\.(.*)$": r"blocks.\1.attn2.to_v.\2",
    r"^blocks\.(\d+)\.cross_attn\.v_img\.(.*)$":
    r"blocks.\1.attn2.add_v_proj.\2",
    r"^blocks\.(\d+)\.cross_attn\.o\.(.*)$": r"blocks.\1.attn2.to_out.0.\2",
    r"^blocks\.(\d+)\.cross_attn\.norm_q\.(.*)$":
    r"blocks.\1.attn2.norm_q.\2",
    r"^blocks\.(\d+)\.cross_attn\.norm_k\.(.*)$":
    r"blocks.\1.attn2.norm_k.\2",
    r"^blocks\.(\d+)\.cross_attn\.norm_k_img\.(.*)$":
    r"blocks.\1.attn2.norm_added_k.\2",
    r"^blocks\.(\d+)\.ffn\.0\.(.*)$": r"blocks.\1.ffn.net.0.proj.\2",
    r"^blocks\.(\d+)\.ffn\.2\.(.*)$": r"blocks.\1.ffn.net.2.\2",
    r"^blocks\.(\d+)\.modulation": r"blocks.\1.scale_shift_table",
    r"^blocks\.(\d+)\.norm3\.(.*)$": r"blocks.\1.norm2.\2",
}


def convert_key(key: str) -> str:
    for pattern, repl in WAN_TO_DIFFUSERS.items():
        new, n = re.subn(pattern, repl, key)
        if n:
            return new
    return key


def convert(input_path: str, output_path: str) -> int:
    import numpy as np  # noqa: F401
    from safetensors.numpy import load_file, save_file

    if input_path.endswith((".pt", ".pth", ".bin")):
        import torch

        ckpt = torch.load(input_path, map_location="cpu",
                          weights_only=False)
        if isinstance(ckpt, dict) and "state_dict" in ckpt:
            ckpt = ckpt["state_dict"]
        tensors = {k: v.float().numpy() for k, v in ckpt.items()
                   if hasattr(v, "numpy")}
    else:
        tensors = load_file(input_path)
    out = {convert_key(k): v for k, v in tensors.items()}
    save_file(out, output_path)
    print(f"wrote {len(out)} tensors to {output_path}")
    return len(out)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input")
    p.add_argument("output")
    a = p.parse_args()
    convert(a.input, a.output)


if __name__ == "__main__":
    main()
