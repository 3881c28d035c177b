"""VIDEO_SPARSE_ATTN backend.

Analog of /root/reference/fastvideo/attention/backends/video_sparse_attn.py:
tiles tokens into (4,4,4) video cubes, runs the VSA composition (compression
branch * gate + top-k block-sparse branch), and restores token order. The
video grid arrives from the model via the ``grid`` kwarg; per-step sparsity
rides the forward-context metadata.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fastvideo_tpu.attention.backends.abstract import (AttentionBackend,
                                                       AttentionMetadata)
from fastvideo_tpu.ops.vsa import (tile_layout, tile_tokens, untile_tokens,
                                   video_sparse_attn)

# TPU default: 256-token (4,8,8) tiles — 256-row MXU blocks and 64 KB KV
# DMAs (the reference's FA4/CuTe fastpath geometry, ops.py:88-90). The
# 64-token (4,4,4) geometry matches the reference default but starves the
# MXU on TPU.
VSA_TPU_TILE = (4, 8, 8)

Array = jax.Array


class VideoSparseAttentionBackend(AttentionBackend):
    name = "VIDEO_SPARSE_ATTN"
    needs_grid = True

    def forward(self, q: Array, k: Array, v: Array,
                metadata: AttentionMetadata | None = None, *,
                kv_valid: int | None = None,
                grid: tuple[int, int, int] | None = None,
                gate: Array | None = None) -> Array:
        assert grid is not None, "VSA needs the (t, h, w) token grid"
        dit_shape = tuple(int(g) for g in grid)
        s_tokens = dit_shape[0] * dit_shape[1] * dit_shape[2]
        s_in = q.shape[1]

        sparsity = 0.0
        if metadata is not None:
            sparsity = float(metadata.extra.get("VSA_sparsity", 0.0))

        tile = VSA_TPU_TILE
        tile_elems = tile[0] * tile[1] * tile[2]

        def prep(x):
            t = tile_tokens(x[:, :s_tokens], dit_shape, tile)
            return t.transpose(0, 2, 1, 3)  # BHSD tiled

        qt, kt, vt = prep(q), prep(k), prep(v)
        gt = prep(gate) if gate is not None else None
        _, _, block_sizes, _, padded = tile_layout(dit_shape, tile)
        nb = padded // tile_elems
        topk = max(1, min(nb, int(-(-((1.0 - sparsity) * nb) // 1))))
        out = video_sparse_attn(qt, kt, vt, jnp.asarray(block_sizes), topk,
                                gate_compress=gt, scale=self.softmax_scale,
                                tile_elems=tile_elems)
        out = untile_tokens(out.transpose(0, 2, 1, 3), dit_shape, tile)
        if s_in > s_tokens:
            out = jnp.pad(out, ((0, 0), (0, s_in - s_tokens), (0, 0),
                                (0, 0)))
        return out
