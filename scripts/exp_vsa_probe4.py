"""VSA dot-geometry ceiling probes (wrong math, fixed instruction mix).

A. pure-dots: the exact (scores, pv) dot sequence of the sparse kernel —
   no gather, no concat, one resident kv block. The MXU ceiling for this
   geometry.
B. pure-dots, bigger q block (q_group=9 -> M=2520): fewer grid steps.
C. gather, NO concat: per-chunk dot pairs (N=E per score dot).
D. heads-folded q block: M = 840 but process 3 heads' q rows in one grid
   step... (skipped if shapes don't divide)
"""
import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, D = 12, 128
S = 21 * 30 * 52
E = 280
NB = S // E
TOPK = 24


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


def pure_kernel(q_ref, kv_ref, o_ref, acc_ref, *, nsteps):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    kv = kv_ref[0]
    s = jax.lax.dot_general(q, kv, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    acc_ref[...] += jax.lax.dot(s.astype(kv.dtype), kv,
                                preferred_element_type=jnp.float32)

    @pl.when(j == nsteps - 1)
    def _s():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def pure(q, kv, q_rows, kv_rows, nsteps):
    h, s, d = q.shape
    ng = s // q_rows
    return pl.pallas_call(
        functools.partial(pure_kernel, nsteps=nsteps),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(h, ng, nsteps),
            in_specs=[
                pl.BlockSpec((1, q_rows, d), lambda h_, qi, j: (h_, qi, 0)),
                pl.BlockSpec((1, kv_rows, d), lambda h_, qi, j: (h_, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, q_rows, d),
                                   lambda h_, qi, j: (h_, qi, 0)),
            scratch_shapes=[pltpu.VMEM((q_rows, d), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * h * s * nsteps * kv_rows * d,
            bytes_accessed=2 * h * s * d * 4, transcendentals=0),
    )(q, kv)


def noconcat_kernel(idx_ref, q_ref, *rest, unroll):
    kv_refs = rest[:2 * unroll]
    o_ref, acc_ref = rest[2 * unroll:]
    j = pl.program_id(3)
    nsteps = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]
    for c in range(unroll):
        k = kv_refs[2 * c][0, 0]
        v = kv_refs[2 * c + 1][0, 0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc_ref[...] += jax.lax.dot(s.astype(v.dtype), v,
                                    preferred_element_type=jnp.float32)

    @pl.when(j == nsteps - 1)
    def _s():
        o_ref[0, 0] = acc_ref[...].astype(o_ref.dtype)


def noconcat(q, k, v, idx, unroll):
    b, h, s, d = q.shape
    ng = idx.shape[2]
    q_rows = (NB // ng) * E
    nsteps = idx.shape[-1] // unroll

    def kv_spec(c):
        return pl.BlockSpec(
            (1, 1, E, d),
            lambda b_, h_, qi, j, idx, c=c: (b_, h_,
                                             idx[b_, h_, qi,
                                                 j * unroll + c], 0))

    in_specs = [pl.BlockSpec((1, 1, q_rows, d),
                             lambda b_, h_, qi, j, idx: (b_, h_, qi, 0))]
    for c in range(unroll):
        in_specs.append(kv_spec(c))
        in_specs.append(kv_spec(c))
    ops = [idx, q]
    for _ in range(unroll):
        ops.append(k)
        ops.append(v)
    return pl.pallas_call(
        functools.partial(noconcat_kernel, unroll=unroll),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, ng, nsteps),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, q_rows, d),
                                   lambda b_, h_, qi, j, idx: (b_, h_, qi,
                                                               0)),
            scratch_shapes=[pltpu.VMEM((q_rows, d), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * h * s * TOPK * E * d,
            bytes_accessed=2 * h * s * d * 4, transcendentals=0),
    )(*ops)


def main():
    key = jax.random.PRNGKey(0)
    q3 = jax.random.normal(key, (H, S, D), jnp.bfloat16)
    kv = jax.random.normal(key, (H, TOPK * E, D), jnp.bfloat16)

    # A: q_group=3 geometry (q_rows=840), kv = all topk rows resident,
    # nsteps chosen so FLOPs match the sparse kernel's 1.35 TF
    for name, (qr, kvr, ns) in {
        "A g3 u6 ": (3 * E, 6 * E, 4),
        "A g3 u24": (3 * E, 24 * E, 1),
        "A g9 u6 ": (9 * E, 6 * E, 4),
        "A g39u24": (39 * E, 24 * E, 1),
    }.items():
        try:
            fn = jax.jit(lambda q_, kv_, qr=qr, kvr=kvr, ns=ns: pure(
                q_, kv_[:, :kvr], qr, kvr, ns))
            t = timeit(fn, q3, kv)
            gf = 4 * H * S * ns * kvr * D / 1e9
            print(f"{name}: {t:.1f} ms ({gf/t:.0f} GF/ms = TF/s)",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__} {str(e)[:160]}",
                  flush=True)

    q = q3[None]
    k = jax.random.normal(key, (1, H, S, D), jnp.bfloat16)
    v = jax.random.normal(key, (1, H, S, D), jnp.bfloat16)
    ng = NB // 3
    idx = jax.random.randint(jax.random.PRNGKey(1), (1, H, ng, TOPK), 0, NB,
                             jnp.int32)
    for u in (6,):
        try:
            fn = jax.jit(lambda q_, k_, v_, i_, u=u: noconcat(
                q_, k_, v_, i_, u))
            t = timeit(fn, q, k, v, idx)
            print(f"C noconcat u{u}: {t:.1f} ms", flush=True)
        except Exception as e:
            print(f"C noconcat u{u}: FAIL {type(e).__name__} {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
