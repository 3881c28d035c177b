"""SLIDING_TILE_ATTN backend.

Analog of the reference STA backend (archived out of their main branch but
kernels retained, docs/attention/index.md:8-10). Window sizes come from
metadata (``STA_window`` in tiles, per-head list or single tuple).
"""

from __future__ import annotations

import jax

from fastvideo_tpu.attention.backends.abstract import (AttentionBackend,
                                                       AttentionMetadata)
from fastvideo_tpu.ops.sta import sliding_tile_attention

Array = jax.Array

DEFAULT_WINDOW = (3, 3, 3)  # tiles


class SlidingTileAttentionBackend(AttentionBackend):
    name = "SLIDING_TILE_ATTN"
    needs_grid = True

    def forward(self, q: Array, k: Array, v: Array,
                metadata: AttentionMetadata | None = None, *,
                kv_valid: int | None = None,
                grid: tuple[int, int, int] | None = None,
                gate: Array | None = None) -> Array:
        assert grid is not None, "STA needs the (t, h, w) token grid"
        dit_shape = tuple(int(g) for g in grid)
        s_tokens = dit_shape[0] * dit_shape[1] * dit_shape[2]
        s_in = q.shape[1]
        window = DEFAULT_WINDOW
        tile = (4, 8, 8)
        if metadata is not None:
            window = metadata.extra.get("STA_window", window)
            tile = metadata.extra.get("STA_tile", tile)
        num_heads = q.shape[2]
        if isinstance(window[0], int):
            windows = tuple(tuple(window) for _ in range(num_heads))
        else:
            windows = tuple(tuple(w) for w in window)
        out = sliding_tile_attention(q[:, :s_tokens], k[:, :s_tokens],
                                     v[:, :s_tokens], dit_shape, windows,
                                     tile, scale=self.softmax_scale)
        if s_in > s_tokens:
            import jax.numpy as jnp

            out = jnp.pad(out, ((0, 0), (0, s_in - s_tokens), (0, 0),
                                (0, 0)))
        return out
