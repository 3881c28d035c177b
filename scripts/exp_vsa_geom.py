"""Experiment: VSA sparse-kernel time vs tile geometry on the real chip.

Production shape: Wan2.1 480p x 81f -> token grid (21, 30, 52), 12 heads,
head_dim 128, sparsity 0.8. For each candidate tile geometry we time the
block-sparse Pallas kernel, the coarse compression branch, and the one-time
tile permutation, and compare against dense flash.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from fastvideo_tpu.ops.vsa import (block_mean, block_sparse_attention,
                                   tile_layout, tile_tokens, untile_tokens,
                                   video_sparse_attn)
from fastvideo_tpu.ops.flash_attention import flash_attention

GRID = (21, 30, 52)
H, D = 12, 128
SPARSITY = 0.8
S = GRID[0] * GRID[1] * GRID[2]


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, n=5):
    fn(*args)  # compile
    sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000  # ms


def main():
    key = jax.random.PRNGKey(0)
    # dense flash baseline at true 32760 tokens (padded to block multiple
    # internally)
    q = jax.random.normal(key, (1, H, S, D), jnp.bfloat16)
    k = jax.random.normal(key, (1, H, S, D), jnp.bfloat16)
    v = jax.random.normal(key, (1, H, S, D), jnp.bfloat16)
    f = jax.jit(lambda q, k, v: flash_attention(q, k, v))
    t_flash = timeit(f, q, k, v)
    print(f"dense flash {S} tokens: {t_flash:.1f} ms")

    geoms = [(4, 8, 8), (3, 10, 8), (7, 6, 8), (7, 10, 4), (7, 10, 8),
             (4, 8, 16)]
    for tile in geoms:
        elems = tile[0] * tile[1] * tile[2]
        try:
            _, _, block_sizes, _, padded = tile_layout(GRID, tile)
        except Exception as e:
            print(f"tile {tile}: layout failed {e}")
            continue
        nb = padded // elems
        topk = max(1, int(np.ceil((1.0 - SPARSITY) * nb)))
        qt = jax.random.normal(key, (1, H, padded, D), jnp.bfloat16)
        kt = jax.random.normal(key, (1, H, padded, D), jnp.bfloat16)
        vt = jax.random.normal(key, (1, H, padded, D), jnp.bfloat16)
        bs = jnp.asarray(block_sizes)

        # full composition (compression + topk + sparse)
        comp = jax.jit(lambda q_, k_, v_: video_sparse_attn(
            q_, k_, v_, bs, topk, tile_elems=elems))
        t_comp = timeit(comp, qt, kt, vt)

        # sparse kernel alone with random indices
        idx = jax.random.randint(jax.random.PRNGKey(1), (1, H, nb, topk), 0,
                                 nb, jnp.int32)
        sp = jax.jit(lambda q_, k_, v_, i_: block_sparse_attention(
            q_, k_, v_, i_, bs, tile_elems=elems))
        t_sparse = timeit(sp, qt, kt, vt, idx)

        visits = H * nb * topk
        print(f"tile {tile} elems={elems} nb={nb} topk={topk} "
              f"pad={padded/S:.3f}x visits={visits}: "
              f"sparse {t_sparse:.1f} ms, full-comp {t_comp:.1f} ms, "
              f"us/visit {t_sparse*1000/visits:.2f}")

    # one-time permutation cost at model width (1536 channels)
    xs = jax.random.normal(key, (1, S, 1536), jnp.bfloat16)
    for tile in [(4, 8, 8), (7, 6, 8)]:
        tt = jax.jit(lambda x_: tile_tokens(x_, GRID, tile))
        t_tile = timeit(tt, xs)
        _, _, _, _, padded = tile_layout(GRID, tile)
        xp = jax.random.normal(key, (1, padded, 1536), jnp.bfloat16)
        ut = jax.jit(lambda x_: untile_tokens(x_, GRID, tile))
        t_untile = timeit(ut, xp)
        print(f"permute {tile}: tile {t_tile:.2f} ms, untile {t_untile:.2f} ms")

    # per-layer prep cost as currently paid (q/k/v/gate BHSD at head layout)
    qh = jax.random.normal(key, (1, S, H, D), jnp.bfloat16)

    def prep4(q_):
        t = tile_tokens(q_, GRID, (4, 8, 8))
        return t.transpose(0, 2, 1, 3)

    p4 = jax.jit(lambda a, b, c, d_: [prep4(x) for x in (a, b, c, d_)])
    t_prep = timeit(lambda a, b, c, d_: p4(a, b, c, d_)[0], qh, qh, qh, qh)
    print(f"per-layer 4x tile+transpose (current cost): {t_prep:.2f} ms")


if __name__ == "__main__":
    main()
