#!/usr/bin/env python3
"""Convert a PyTorch checkpoint (.pt/.pth) to a safetensors file.

Analog of /root/reference/scripts/checkpoint_conversion/
pt_to_safetensors.py: unwraps the usual nesting keys, skips non-tensor
entries, optional key filtering.

Usage:
    python scripts/checkpoint_conversion/pt_to_safetensors.py in.pt out.safetensors
"""

from __future__ import annotations

import argparse
import fnmatch
import os


def convert(input_path: str, output_path: str, key: str | None = None,
            force: bool = False,
            skip_patterns: list[str] | None = None) -> int:
    import torch
    from safetensors.torch import save_file

    if not os.path.exists(input_path):
        raise FileNotFoundError(input_path)
    if os.path.exists(output_path) and not force:
        raise FileExistsError(f"{output_path} exists; use --force")

    ckpt = torch.load(input_path, map_location="cpu", weights_only=False)
    state = ckpt
    if isinstance(ckpt, dict) and not all(
            torch.is_tensor(v) for v in ckpt.values()):
        if key is not None:
            state = ckpt[key]
        else:
            for k in ("state_dict", "model_state_dict", "model", "ema",
                      "module"):
                if k in ckpt and isinstance(ckpt[k], dict):
                    state = ckpt[k]
                    break

    out = {}
    for name, value in state.items():
        if not torch.is_tensor(value):
            continue
        if skip_patterns and any(
                fnmatch.fnmatch(name, p) for p in skip_patterns):
            continue
        out[name] = value.contiguous()
    save_file(out, output_path)
    print(f"wrote {len(out)} tensors to {output_path}")
    return len(out)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--key", default=None,
                   help="nested dict key holding the state dict")
    p.add_argument("--force", action="store_true")
    p.add_argument("--skip", nargs="*", default=None,
                   help="glob patterns of keys to drop")
    a = p.parse_args()
    convert(a.input, a.output, a.key, a.force, a.skip)


if __name__ == "__main__":
    main()
