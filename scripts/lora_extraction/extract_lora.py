#!/usr/bin/env python3
"""Extract a LoRA adapter from a fine-tuned model by SVD of (FT - base).

Analog of /root/reference/scripts/lora_extraction/extract_lora.py: for
every 2D weight present in both checkpoints, the rank-r truncated SVD of
the delta becomes ``<key>.lora_A`` ([r, in]) and ``<key>.lora_B``
([out, r]) with sqrt-singular-value splitting, so
``W_ft ~= W_base + lora_B @ lora_A``. Non-2D or unchanged weights are
skipped; mismatched shapes are reported.

Usage:
    python scripts/lora_extraction/extract_lora.py \
        --base base.safetensors --ft finetuned.safetensors \
        --out adapter.safetensors --rank 16
"""

from __future__ import annotations

import argparse

import numpy as np


def extract_lora(base: dict[str, np.ndarray], ft: dict[str, np.ndarray],
                 rank: int, threshold: float = 0.0
                 ) -> tuple[dict[str, np.ndarray], list[str]]:
    adapter: dict[str, np.ndarray] = {}
    skipped: list[str] = []
    for key, wb in base.items():
        wf = ft.get(key)
        if wf is None:
            skipped.append(f"{key}: missing in ft")
            continue
        if wb.shape != wf.shape:
            skipped.append(f"{key}: shape {wb.shape} vs {wf.shape}")
            continue
        if wb.ndim != 2:
            continue
        delta = wf.astype(np.float32) - wb.astype(np.float32)
        if not np.abs(delta).max() > threshold:
            continue
        r = min(rank, *delta.shape)
        u, s, vt = np.linalg.svd(delta, full_matrices=False)
        sr = np.sqrt(s[:r])
        adapter[f"{key}.lora_B"] = (u[:, :r] * sr[None]).astype(np.float32)
        adapter[f"{key}.lora_A"] = (sr[:, None] * vt[:r]).astype(np.float32)
    return adapter, skipped


def reconstruction_error(base: np.ndarray, ft: np.ndarray, a: np.ndarray,
                         b: np.ndarray) -> float:
    approx = base.astype(np.float32) + b @ a
    delta = ft.astype(np.float32) - base.astype(np.float32)
    denom = np.linalg.norm(delta) or 1.0
    return float(np.linalg.norm(ft.astype(np.float32) - approx) / denom)


def main() -> None:
    from safetensors.numpy import load_file, save_file

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base", required=True)
    p.add_argument("--ft", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--rank", type=int, default=16)
    a = p.parse_args()
    base = load_file(a.base)
    ft = load_file(a.ft)
    adapter, skipped = extract_lora(base, ft, a.rank)
    for msg in skipped:
        print(f"skip {msg}")
    save_file(adapter, a.out)
    print(f"wrote {len(adapter) // 2} LoRA pairs (rank {a.rank}) to "
          f"{a.out}")


if __name__ == "__main__":
    main()
