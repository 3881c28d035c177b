"""Pure-dot (M, N) alignment sweep: same flash-style (scores, pv) dot pair,
fixed total FLOPs, varying q-block rows M and kv rows N. Separates the
128-alignment effect from everything else in the sparse kernel."""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 128
TARGET_FLOPS = 1.4e12


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


def kernel(q_ref, kv_ref, o_ref, acc_ref, *, nsteps):
    j = pl.program_id(1)

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


def run(q, kv, nsteps):
    g, m, d = q.shape
    return pl.pallas_call(
        functools.partial(kernel, nsteps=nsteps),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(g, nsteps),
        in_specs=[
            pl.BlockSpec((1, m, d), lambda g_, j: (g_, 0, 0)),
            pl.BlockSpec((1, kv.shape[1], d), lambda g_, j: (g_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, m, d), lambda g_, j: (g_, 0, 0)),
        scratch_shapes=[pltpu.VMEM((m, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(flops=4 * g * m * nsteps * kv.shape[1]
                                      * d,
                                      bytes_accessed=2 * g * m * d * 4,
                                      transcendentals=0),
    )(q, kv)


key = jax.random.PRNGKey(0)
for m, n in [(512, 1024), (840, 1680), (896, 1792), (512, 1680),
             (840, 1024), (896, 1680), (840, 1792), (256, 2048),
             (1024, 2048)]:
    flops_per = 4 * m * n * D
    total_blocks = max(1, int(TARGET_FLOPS / flops_per))
    g = 96
    nsteps = max(1, total_blocks // g)
    q = jax.random.normal(key, (g, m, D), jnp.bfloat16)
    kv = jax.random.normal(key, (g, n, D), jnp.bfloat16)
    try:
        fn = jax.jit(lambda q_, kv_, ns=nsteps: run(q_, kv_, ns))
        t = timeit(fn, q, kv)
        tf = 4 * g * m * nsteps * n * D / 1e12
        print(f"M={m:5d} N={n:5d}: {t:6.1f} ms  {tf/t*1000:6.1f} TF/s",
              flush=True)
    except Exception as e:
        print(f"M={m} N={n}: FAIL {type(e).__name__} {str(e)[:120]}",
              flush=True)
