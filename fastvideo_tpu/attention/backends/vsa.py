"""VIDEO_SPARSE_ATTN backend.

Analog of /root/reference/fastvideo/attention/backends/video_sparse_attn.py:
tiles tokens into video cubes, runs the VSA composition (compression
branch * gate + top-k block-sparse branch), and restores token order. The
video grid arrives from the model via the ``grid`` kwarg; per-step sparsity
rides the forward-context metadata.

TPU design points:

* tile geometry is chosen PER SHAPE: an exact-divide geometry (zero
  intra-tile padding) makes the permutation a reshape/transpose and lets
  the flash-style BlockSpec-gather kernel run unmasked. Falls back to the
  padded (4,8,8) scatter layout when the grid has no suitable divisors.
  (The reference's fixed (4,4,4) cube is a CUDA-warp geometry choice,
  video_sparse_attn.py:28-58.)
* ``pre_tiled=True``: the MODEL runs in tile-major order end-to-end (the
  permutation is hoisted to patch-embed / unpatchify), so the backend is
  permutation-free per layer. This removes the per-layer scatter/gather
  that erased the sparse kernel's win on TPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from fastvideo_tpu.attention.backends.abstract import (AttentionBackend,
                                                       AttentionMetadata)
from fastvideo_tpu.ops.vsa import (select_vsa_tile, tile_layout, tile_tokens,
                                   tile_tokens_exact, tile_valid_mask,
                                   untile_tokens, untile_tokens_exact,
                                   video_sparse_attn)

# Fallback for grids with no exact-divide geometry: 256-token (4,8,8)
# tiles — 256-row MXU blocks and 64 KB KV DMAs (the reference's FA4/CuTe
# fastpath geometry, ops.py:88-90).
VSA_TPU_TILE = (4, 8, 8)

Array = jax.Array


@functools.lru_cache(maxsize=64)
def resolve_vsa_tile(grid: tuple[int, int, int]) -> tuple[tuple[int, int,
                                                                int], bool]:
    """(tile geometry, exact-divide?) for a token grid.

    ``FASTVIDEO_VSA_TILE=t,h,w`` forces a geometry (must divide exactly)."""
    forced = os.environ.get("FASTVIDEO_VSA_TILE")
    if forced:
        tile = tuple(int(x) for x in forced.split(","))
        assert len(tile) == 3
        exact = all(g % t == 0 for g, t in zip(grid, tile))
        return tile, exact
    tile = select_vsa_tile(grid)
    if tile is not None:
        return tile, True
    return VSA_TPU_TILE, False


def _q_group(nb: int, tile_elems: int, exact: bool) -> int:
    """Query tiles sharing one top-k set. Gather DMA volume (the binding
    constraint for the sparse kernel on v5e) scales as 1/G; selection
    granularity on the query side coarsens by G (kv granularity is
    unchanged). Adaptive default targets ~3 tiles (~512-1024 q rows) per
    group; ``FASTVIDEO_VSA_QGROUP=1`` restores per-tile selection,
    ``=N`` forces N."""
    if not exact:
        return 1
    forced = int(os.environ.get("FASTVIDEO_VSA_QGROUP", "0"))
    if forced > 0:
        return forced if nb % forced == 0 else 1
    for g in (4, 3, 2):
        if nb % g == 0 and g * tile_elems <= 1280:
            return g
    return 1


class VideoSparseAttentionBackend(AttentionBackend):
    name = "VIDEO_SPARSE_ATTN"
    needs_grid = True
    supports_pre_tiled = True

    def forward(self, q: Array, k: Array, v: Array,
                metadata: AttentionMetadata | None = None, *,
                kv_valid: int | None = None,
                grid: tuple[int, int, int] | None = None,
                gate: Array | None = None,
                pre_tiled: bool = False) -> Array:
        assert grid is not None, "VSA needs the (t, h, w) token grid"
        dit_shape = tuple(int(g) for g in grid)
        s_tokens = dit_shape[0] * dit_shape[1] * dit_shape[2]
        s_in = q.shape[1]

        sparsity = 0.0
        if metadata is not None:
            sparsity = float(metadata.extra.get("VSA_sparsity", 0.0))

        tile, exact = resolve_vsa_tile(dit_shape)
        tile_elems = tile[0] * tile[1] * tile[2]
        if exact:
            padded = s_tokens
            nb = padded // tile_elems
            block_sizes = np.full((nb,), tile_elems, np.int32)
        else:
            _, _, block_sizes, _, padded = tile_layout(dit_shape, tile)
            nb = padded // tile_elems
        topk = max(1, min(nb, int(-(-((1.0 - sparsity) * nb) // 1))))

        if pre_tiled:
            if exact:
                def prep(x):
                    return x[:, :padded].transpose(0, 2, 1, 3)
            else:
                # tile-pad slots carry garbage activations after block 0 —
                # zero them before they enter block means / kv reads.
                mask = jnp.asarray(tile_valid_mask(dit_shape, tile))

                def prep(x):
                    xm = (x[:, :padded] *
                          mask[None, :, None, None].astype(x.dtype))
                    return xm.transpose(0, 2, 1, 3)
        elif exact:
            def prep(x):
                t = tile_tokens_exact(x[:, :s_tokens], dit_shape, tile)
                return t.transpose(0, 2, 1, 3)
        else:
            def prep(x):
                t = tile_tokens(x[:, :s_tokens], dit_shape, tile)
                return t.transpose(0, 2, 1, 3)

        qt, kt, vt = prep(q), prep(k), prep(v)
        gt = prep(gate) if gate is not None else None
        out = video_sparse_attn(qt, kt, vt, jnp.asarray(block_sizes), topk,
                                gate_compress=gt, scale=self.softmax_scale,
                                tile_elems=tile_elems, full_tiles=exact,
                                q_group=_q_group(nb, tile_elems, exact))
        out = out.transpose(0, 2, 1, 3)
        if pre_tiled:
            if s_in > padded:
                out = jnp.pad(out, ((0, 0), (0, s_in - padded), (0, 0),
                                    (0, 0)))
            return out
        out = (untile_tokens_exact(out, dit_shape, tile) if exact else
               untile_tokens(out, dit_shape, tile))
        if s_in > s_tokens:
            out = jnp.pad(out, ((0, 0), (0, s_in - s_tokens), (0, 0),
                                (0, 0)))
        return out
