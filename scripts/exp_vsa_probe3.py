"""VSA fast-kernel wall bisect at the bench shape (wrong-math probes OK).

Variants:
  base    — ops/vsa.py block_sparse_attention_fast as shipped
  seq     — same kernel, contiguous tile indices (kills gather randomness;
            WRONG MATH, same instruction mix)
  nosm    — no exp/softmax bookkeeping (WRONG MATH): isolates VPU cost
  al      — aligned gather: k/v pre-reshaped [b,h,nb,E,d] so every gathered
            block starts on its own (E,d) tile layout (no sublane-misaligned
            HBM window: E=280 % 16 != 0 in the [s,d] layout)
  al-uN   — aligned + unroll N
"""
import functools
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastvideo_tpu.ops.vsa import (MASK_VALUE, block_sparse_attention_fast,
                                   select_vsa_tile)

GRID = (21, 30, 52)
H, D = 12, 128
S = GRID[0] * GRID[1] * GRID[2]
_LANE = 128


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


def kernel(idx_ref, q_ref, *rest, scale, unroll, softmax):
    kv_refs = rest[:2 * unroll]
    o_ref, m_ref, l_ref, acc_ref = rest[2 * unroll:]
    j = pl.program_id(3)
    nsteps = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]
    ks = [kv_refs[2 * c] for c in range(unroll)]
    vs = [kv_refs[2 * c + 1] for c in range(unroll)]
    k = jnp.concatenate([r[0, 0] if r.ndim == 4 else r[0, 0, 0] for r in ks],
                        axis=0)
    v = jnp.concatenate([r[0, 0] if r.ndim == 4 else r[0, 0, 0] for r in vs],
                        axis=0)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if softmax:
        m_prev = m_ref[...]
        l_prev = l_ref[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_ref[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = m_next
        pv = jax.lax.dot(p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv
    else:
        pv = jax.lax.dot(s.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] + pv

    @pl.when(j == nsteps - 1)
    def _store():
        if softmax:
            l = l_ref[...][:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)
        else:
            o_ref[0, 0] = acc_ref[...].astype(o_ref.dtype)


def run_variant(q, k, v, idx, tile_elems, unroll, aligned, softmax):
    b, h, s, d = q.shape
    nb = s // tile_elems
    ng = idx.shape[2]
    q_rows = (nb // ng) * tile_elems
    nsteps = idx.shape[-1] // unroll
    assert nsteps * unroll == idx.shape[-1]
    scale = 1.0 / math.sqrt(d)
    if aligned:
        k = k.reshape(b, h, nb, tile_elems, d)
        v = v.reshape(b, h, nb, tile_elems, d)

        def kv_spec(c):
            return pl.BlockSpec(
                (1, 1, 1, tile_elems, d),
                lambda b_, h_, qi, j, idx, c=c: (
                    b_, h_, idx[b_, h_, qi, j * unroll + c], 0, 0))
    else:
        def kv_spec(c):
            return pl.BlockSpec(
                (1, 1, tile_elems, d),
                lambda b_, h_, qi, j, idx, c=c: (
                    b_, h_, idx[b_, h_, qi, j * unroll + c], 0))

    in_specs = [pl.BlockSpec((1, 1, q_rows, d),
                             lambda b_, h_, qi, j, idx: (b_, h_, qi, 0))]
    for c in range(unroll):
        in_specs.append(kv_spec(c))
        in_specs.append(kv_spec(c))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, ng, nsteps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, q_rows, d),
                               lambda b_, h_, qi, j, idx: (b_, h_, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((q_rows, _LANE), jnp.float32),
            pltpu.VMEM((q_rows, _LANE), jnp.float32),
            pltpu.VMEM((q_rows, d), jnp.float32),
        ],
    )
    operands = [idx, q]
    for _ in range(unroll):
        operands.append(k)
        operands.append(v)
    topk = idx.shape[-1]
    return pl.pallas_call(
        functools.partial(kernel, scale=scale, unroll=unroll,
                          softmax=softmax),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * h * s * topk * tile_elems * d,
            bytes_accessed=2 * h * s * d * 4,
            transcendentals=h * s * topk * tile_elems,
        ),
    )(*operands)


def main():
    key = jax.random.PRNGKey(0)
    tile = select_vsa_tile(GRID)
    elems = tile[0] * tile[1] * tile[2]
    nb = S // elems
    topk = max(1, int(np.ceil(0.2 * nb)))
    g = 3
    ng = nb // g
    print(f"tile={tile} E={elems} nb={nb} topk={topk} q_group={g}",
          flush=True)
    q = jax.random.normal(key, (1, H, S, D), jnp.bfloat16)
    k = jax.random.normal(key, (1, H, S, D), jnp.bfloat16)
    v = jax.random.normal(key, (1, H, S, D), jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (1, H, ng, topk), 0, nb,
                             jnp.int32)
    idx_seq = (jnp.arange(topk)[None, None, None] +
               jnp.arange(ng)[None, None, :, None] * g) % nb
    idx_seq = jnp.broadcast_to(idx_seq, idx.shape).astype(jnp.int32)

    t = timeit(jax.jit(lambda q_, k_, v_, i_: block_sparse_attention_fast(
        q_, k_, v_, i_, tile_elems=elems)), q, k, v, idx)
    print(f"base(shipped): {t:.1f} ms", flush=True)

    for name, (i_, al, sm, u) in {
        "seq   u6": (idx_seq, False, True, 6),
        "nosm  u6": (idx, False, False, 6),
        "al    u6": (idx, True, True, 6),
        "al    u12": (idx, True, True, 12),
        "al    u24": (idx, True, True, 24),
        "al-nosm u6": (idx, True, False, 6),
    }.items():
        try:
            fn = jax.jit(lambda q_, k_, v_, i2, u=u, al=al, sm=sm:
                         run_variant(q_, k_, v_, i2, elems, u, al, sm))
            t = timeit(fn, q, k, v, i_)
            print(f"{name}: {t:.1f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
