"""Sliding Tile Attention (STA) for TPU.

Replaces the reference's ThunderKittens/Triton STA kernels
(/root/reference/fastvideo-kernel/csrc/attention/st_attn_h100.cu +
triton_kernels/st_attn_triton.py): 3D local-window attention over
(t, h, w) video tiles with per-head window sizes.

TPU formulation: the allowed kv-tile set per query tile is STATIC given
(grid, tile, windows), so STA is exactly the VSA block-sparse kernel with
precomputed (host-side) gather indices instead of a learned top-k —
per-head windows become per-head index rows; ragged window sizes are padded
with sentinel (-1) slots the kernel masks out.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from fastvideo_tpu.ops.vsa import (block_sparse_attention, tile_layout,
                                   tile_tokens, untile_tokens)

Array = jax.Array


@functools.lru_cache(maxsize=32)
def sta_window_indices(
    dit_seq_shape: tuple[int, int, int],
    tile_size: tuple[int, int, int],
    window_sizes: tuple[tuple[int, int, int], ...],
) -> np.ndarray:
    """[H, nQ, K_max] int32 kv-tile indices per head; -1 pads ragged rows.

    ``window_sizes[h]`` = (wt, wh, ww) window, in TILES, centered on the
    query tile (clamped at grid edges) — the reference kernel's per-head
    (t, h, w) tile windows (st_attn wrapper, fastvideo_kernel/ops.py:19-66).
    """
    _, _, _, (nt, nh, nw), _ = tile_layout(dit_seq_shape, tile_size)
    num_heads = len(window_sizes)
    rows: list[list[list[int]]] = []
    for h in range(num_heads):
        wt, wh, ww = window_sizes[h]
        head_rows = []
        for t in range(nt):
            for y in range(nh):
                for x in range(nw):
                    sel = []
                    for tt in range(max(0, t - wt // 2),
                                    min(nt, t - wt // 2 + wt)):
                        for yy in range(max(0, y - wh // 2),
                                        min(nh, y - wh // 2 + wh)):
                            for xx in range(max(0, x - ww // 2),
                                            min(nw, x - ww // 2 + ww)):
                                sel.append((tt * nh + yy) * nw + xx)
                    head_rows.append(sel)
        rows.append(head_rows)
    k_max = max(len(r) for head in rows for r in head)
    out = np.full((num_heads, nt * nh * nw, k_max), -1, dtype=np.int32)
    for h, head_rows in enumerate(rows):
        for qi, sel in enumerate(head_rows):
            out[h, qi, :len(sel)] = sel
    return out


def sliding_tile_attention(
    q: Array,
    k: Array,
    v: Array,
    dit_seq_shape: tuple[int, int, int],
    window_sizes: tuple[tuple[int, int, int], ...],
    tile_size: tuple[int, int, int] = (4, 8, 8),
    *,
    scale: float | None = None,
) -> Array:
    """STA over [B, S, H, D] tensors in ORIGINAL token order.

    Tokens are permuted into tiles, attended within per-head 3D windows via
    the block-sparse kernel, and restored.
    """
    b, s, h, d = q.shape
    tile_elems = math.prod(tile_size)
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    _, _, block_sizes, _, padded = tile_layout(tuple(dit_seq_shape),
                                               tuple(tile_size))

    def prep(x):
        return tile_tokens(x, dit_seq_shape, tile_size).transpose(0, 2, 1, 3)

    qt, kt, vt = prep(q), prep(k), prep(v)
    idx = sta_window_indices(tuple(dit_seq_shape), tuple(tile_size),
                             tuple(tuple(w) for w in window_sizes))
    indices = jnp.broadcast_to(
        jnp.asarray(idx)[None], (b, *idx.shape))
    out = block_sparse_attention(qt, kt, vt, indices,
                                 jnp.asarray(block_sizes), scale=scale,
                                 tile_elems=tile_elems)
    return untile_tokens(out.transpose(0, 2, 1, 3), dit_seq_shape, tile_size)
