"""Sweep q_group x unroll for the fast VSA kernel at the bench shape."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from fastvideo_tpu.ops.vsa import block_sparse_attention_fast

GRID = (21, 30, 52)
H, D = 12, 128
SPARSITY = 0.8
S = GRID[0] * GRID[1] * GRID[2]


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, n=3):
    sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000


key = jax.random.PRNGKey(0)
for tile, elems in [((7, 10, 4), 280), ((21, 6, 4), 504)]:
    nb = S // elems
    topk = max(1, int(np.ceil((1.0 - SPARSITY) * nb)))
    q = jax.random.normal(key, (1, H, S, D), jnp.bfloat16)
    k = jax.random.normal(key, (1, H, S, D), jnp.bfloat16)
    v = jax.random.normal(key, (1, H, S, D), jnp.bfloat16)
    for g in (1, 2, 3, 4):
        if nb % g:
            continue
        ng = nb // g
        idx = jax.random.randint(jax.random.PRNGKey(1), (1, H, ng, topk), 0,
                                 nb, jnp.int32)
        for u in (4, 8):
            if u > topk:
                continue
            try:
                fn = jax.jit(lambda q_, k_, v_, i_, u=u, e=elems:
                             block_sparse_attention_fast(
                                 q_, k_, v_, i_, tile_elems=e, unroll=u))
                t = timeit(fn, q, k, v, idx)
                print(f"tile {tile} E={elems} nb={nb} topk={topk} g={g} "
                      f"u={u}: {t:.1f} ms", flush=True)
            except Exception as e:
                print(f"tile {tile} g={g} u={u}: FAIL {str(e)[:160]}",
                      flush=True)
