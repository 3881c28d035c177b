#!/usr/bin/env python3
"""Merge a LoRA adapter into base weights (inverse of extract_lora).

Analog of /root/reference/scripts/lora_extraction/merge_lora.py:
``W = W_base + alpha * lora_B @ lora_A`` per adapted key.

Usage:
    python scripts/lora_extraction/merge_lora.py \
        --base base.safetensors --adapter adapter.safetensors \
        --out merged.safetensors [--alpha 1.0]
"""

from __future__ import annotations

import argparse

import numpy as np


def merge_lora(base: dict[str, np.ndarray],
               adapter: dict[str, np.ndarray],
               alpha: float = 1.0) -> dict[str, np.ndarray]:
    out = dict(base)
    keys = sorted(k[:-len(".lora_A")] for k in adapter
                  if k.endswith(".lora_A"))
    for key in keys:
        a = adapter[f"{key}.lora_A"].astype(np.float32)
        b = adapter[f"{key}.lora_B"].astype(np.float32)
        if key not in base:
            raise KeyError(f"adapter key {key!r} not in base")
        merged = base[key].astype(np.float32) + alpha * (b @ a)
        out[key] = merged.astype(base[key].dtype)
    return out


def main() -> None:
    from safetensors.numpy import load_file, save_file

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base", required=True)
    p.add_argument("--adapter", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--alpha", type=float, default=1.0)
    a = p.parse_args()
    merged = merge_lora(load_file(a.base), load_file(a.adapter), a.alpha)
    save_file(merged, a.out)
    print(f"wrote merged checkpoint to {a.out}")


if __name__ == "__main__":
    main()
