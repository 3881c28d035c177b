"""Bisect the sparse-kernel floor: gather DMA vs kernel shape."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from fastvideo_tpu.ops.vsa import block_sparse_attention_fast
from fastvideo_tpu.ops.flash_attention import flash_attention

H, D = 12, 128
S = 21 * 30 * 52  # 32760


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
E, nb, topk, g, u = 280, 117, 24, 3, 8
ng = nb // g
q = jax.random.normal(key, (1, H, S, D), jnp.bfloat16)
k = jax.random.normal(key, (1, H, S, D), jnp.bfloat16)
v = jax.random.normal(key, (1, H, S, D), jnp.bfloat16)

# random gather
idx_r = jax.random.randint(jax.random.PRNGKey(1), (1, H, ng, topk), 0, nb,
                           jnp.int32)
# sequential/identity indices (contiguous locality)
base = (jnp.arange(ng) * g)[None, None, :, None]
idx_s = (base + jnp.arange(topk)[None, None, None, :]) % nb
idx_s = jnp.broadcast_to(idx_s, (1, H, ng, topk)).astype(jnp.int32)

fn = jax.jit(lambda q_, k_, v_, i_: block_sparse_attention_fast(
    q_, k_, v_, i_, tile_elems=E, unroll=u))
print(f"sparse gather(random idx): {timeit(fn, q, k, v, idx_r):.1f} ms",
      flush=True)
print(f"sparse gather(seq idx):    {timeit(fn, q, k, v, idx_s):.1f} ms",
      flush=True)

# dense flash truncated to the same FLOP count: kv length = topk*E = 6720
kv_len = topk * E
ks = k[:, :, :kv_len].reshape(1, kv_len, H, D)
vs = v[:, :, :kv_len].reshape(1, kv_len, H, D)
qq = q.transpose(0, 2, 1, 3)
f1 = jax.jit(lambda a, b_, c: flash_attention(a, b_, c, block_q=840,
                                              block_kv=2240))
print(f"dense flash q=32760 kv=6720 (same FLOPs, blocks 840x2240): "
      f"{timeit(f1, qq, ks, vs):.1f} ms", flush=True)
f2 = jax.jit(lambda a, b_, c: flash_attention(a, b_, c, block_q=512,
                                              block_kv=1024))
print(f"dense flash q=32760 kv=6720 (blocks 512x1024): "
      f"{timeit(f2, qq, ks, vs):.1f} ms", flush=True)
# empty-ish sync floor
tiny = jax.jit(lambda a: a[:1, :1, :1, :1] * 2.0)
print(f"sync floor: {timeit(tiny, q):.1f} ms", flush=True)
