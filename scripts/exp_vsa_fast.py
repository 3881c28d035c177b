"""Measure the flash-style BlockSpec-gather VSA kernel + full Wan VSA step
on the real chip at the bench shape."""
from __future__ import annotations

import os
import time

os.environ.setdefault("FASTVIDEO_ATTENTION_BACKEND", "VIDEO_SPARSE_ATTN")

import jax
import jax.numpy as jnp
import numpy as np

GRID = (21, 30, 52)
H, D = 12, 128
SPARSITY = 0.8
S = GRID[0] * GRID[1] * GRID[2]


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, n=5):
    sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000


def main():
    from fastvideo_tpu.ops.flash_attention import flash_attention
    from fastvideo_tpu.ops.vsa import (block_sparse_attention_fast,
                                       select_vsa_tile, video_sparse_attn)

    key = jax.random.PRNGKey(0)
    tile = select_vsa_tile(GRID)
    elems = tile[0] * tile[1] * tile[2]
    nb = S // elems
    topk = max(1, int(np.ceil((1.0 - SPARSITY) * nb)))
    print(f"selected tile {tile} elems={elems} nb={nb} topk={topk}")

    q = jax.random.normal(key, (1, H, S, D), jnp.bfloat16)
    k = jax.random.normal(key, (1, H, S, D), jnp.bfloat16)
    v = jax.random.normal(key, (1, H, S, D), jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (1, H, nb, topk), 0, nb,
                             jnp.int32)

    fast = jax.jit(lambda q_, k_, v_, i_: block_sparse_attention_fast(
        q_, k_, v_, i_, tile_elems=elems))
    t_fast = timeit(fast, q, k, v, idx)
    visits = H * nb * topk
    print(f"fast kernel: {t_fast:.1f} ms ({t_fast*1000/visits:.2f} us/visit)")

    sizes = jnp.full((nb,), elems, jnp.int32)
    comp = jax.jit(lambda q_, k_, v_: video_sparse_attn(
        q_, k_, v_, sizes, topk, tile_elems=elems, full_tiles=True))
    t_comp = timeit(comp, q, k, v)
    print(f"full composition (fast): {t_comp:.1f} ms")

    f = jax.jit(lambda q_, k_, v_: flash_attention(q_, k_, v_))
    t_flash = timeit(f, q, k, v)
    print(f"dense flash: {t_flash:.1f} ms")

    # full Wan 1.3B VSA step, pre-tiled model
    from flax import nnx

    from fastvideo_tpu.attention.backends.abstract import AttentionMetadata
    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.forward_context import set_forward_context
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel

    dit_cfg = WanArchConfig(num_attention_heads=12, attention_head_dim=128,
                            in_channels=16, out_channels=16, text_dim=4096,
                            freq_dim=256, ffn_dim=8960, num_layers=30)
    dit = WanTransformer3DModel(dit_cfg, param_dtype=jnp.bfloat16,
                                rngs=nnx.Rngs(0))
    print(f"vsa_tiled_order={dit.vsa_tiled_order}")
    gd, st = nnx.split(dit)
    lat = jax.random.normal(key, (1, 16, 21, 60, 104), jnp.bfloat16)
    ctx = jax.random.normal(key, (1, 512, 4096), jnp.bfloat16)
    md = AttentionMetadata(extra={"VSA_sparsity": SPARSITY})

    @jax.jit
    def step(st, lat, ctx):
        m = nnx.merge(gd, st)
        t_arr = jnp.full((1,), 757.0, jnp.float32)
        with set_forward_context(attn_metadata=md):
            return m(lat, ctx, t_arr)

    t_step = timeit(step, st, lat, ctx, n=3)
    print(f"full 1.3B VSA step (pre-tiled): {t_step:.0f} ms")


if __name__ == "__main__" and "sweep" not in __import__("sys").argv:
    main()


def sweep_unroll():
    from fastvideo_tpu.ops.vsa import block_sparse_attention_fast
    key = jax.random.PRNGKey(0)
    for tile, elems in [((7, 10, 4), 280), ((21, 6, 4), 504),
                        ((3, 10, 4), 120), ((7, 6, 4), 168)]:
        nb = S // elems
        topk = max(1, int(np.ceil((1.0 - SPARSITY) * nb)))
        q = jax.random.normal(key, (1, H, S, D), jnp.bfloat16)
        k = jax.random.normal(key, (1, H, S, D), jnp.bfloat16)
        v = jax.random.normal(key, (1, H, S, D), jnp.bfloat16)
        idx = jax.random.randint(jax.random.PRNGKey(1), (1, H, nb, topk), 0,
                                 nb, jnp.int32)
        for u in sorted({1, 4, 8, min(topk, 2048 // elems), topk}):
            if u < 1 or u > topk:
                continue
            try:
                fast = jax.jit(lambda q_, k_, v_, i_, u=u, e=elems:
                               block_sparse_attention_fast(
                                   q_, k_, v_, i_, tile_elems=e, unroll=u))
                t = timeit(fast, q, k, v, idx, n=3)
                print(f"tile {tile} E={elems} nb={nb} topk={topk} "
                      f"u={u}: {t:.1f} ms")
            except Exception as e:
                print(f"tile {tile} u={u}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")


if __name__ == "__main__" and "sweep" in __import__("sys").argv:
    sweep_unroll()
