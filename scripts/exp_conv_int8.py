"""Probe: int8 W8A8 variant of the kf decode conv kernel.

The bf16 kf kernel is geometry-bound at 105-112 TF/s (53-57% of the 197
bf16 peak). The MXU runs int8 at 394 TOPS; if the same geometry fraction
holds, the decode conv drops ~2x. This times a minimal int8 kf kernel
(int8 x, int8 w K-folded, int32 accum, fp32 dequant epilogue) against the
production bf16 kf at the decoder's hot shapes.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastvideo_tpu.ops.conv3d import _conv3d_pallas_thcw
from fastvideo_tpu.utils import enable_compilation_cache

enable_compilation_cache()
try:
    from jax.experimental.pallas import Element
except ImportError:  # older jax
    from jax._src.pallas.core import Element


def _kf_int8_kernel(x_ref, w_ref, b_ref, sw_ref, o_ref, *, kt, bh, w_out,
                    sx):
    c = x_ref.shape[2]
    co = o_ref.shape[2]
    x = x_ref[...]
    for h in range(bh):
        xc = x[:, h:h + 3].reshape(kt * 3 * c, x_ref.shape[-1])
        acc = jnp.zeros((co, w_out), jnp.int32)
        for dw in range(3):
            acc = acc + jax.lax.dot_general(
                w_ref[dw], xc[:, dw:dw + w_out],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        out = (acc.astype(jnp.float32) * sw_ref[...] * sx +
               b_ref[...].astype(jnp.float32))
        o_ref[0, h] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kt", "bh", "sx"))
def kf_int8(x, w, b, sw, *, kt, bh, sx):
    tp, hp, c, wp = x.shape
    t_out, h, w_out = tp - kt + 1, hp - 2, wp - 2
    co = w.shape[1]
    grid = (t_out, h // bh)

    return pl.pallas_call(
        functools.partial(_kf_int8_kernel, kt=kt, bh=bh, w_out=w_out,
                          sx=sx),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Element(kt), Element(bh + 2), Element(c), Element(wp)),
                         lambda t, i: (t, i * bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, co, w_out),
                               lambda t, i: (t, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_out, h, co, w_out), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_out * h * w_out * c * co * kt * 9,
            bytes_accessed=x.size * 2, transcendentals=0),
    )(x, w, b.reshape(co, 1), sw.reshape(co, 1))


def timeit(fn, x, *rest, n=4):
    """In-jit rate: loop the kernel with an anti-CSE barrier so dispatch
    overhead amortizes (matches the exp_conv_strategies methodology that
    produced the documented 105-112 TF/s bf16 kf numbers)."""

    @jax.jit
    def run(x, *a):
        def body(i, acc):
            x0 = (x + jax.lax.optimization_barrier(acc).astype(jnp.float32)
                  .astype(x.dtype))
            o = fn(x0, *a)
            return jnp.max(o[..., :1].astype(jnp.float32)) * 1e-30

        o = fn(x, *a)
        return o, jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    o, z = run(x, *rest)
    float(jnp.sum(z.astype(jnp.float32)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        o, z = run(x, *rest)
        float(jnp.sum(z.astype(jnp.float32)))
        ts.append((time.perf_counter() - t0) / (n + 1))
    return min(ts)


def main():
    key = jax.random.PRNGKey(0)
    # decoder hot stages at chunk=2: (T_in(kt folds), H, C, W, Co, kt, bh)
    shapes = [
        ("96ch full-res", 8, 480, 96, 832, 96, 3, 8),
        ("192ch half-res", 8, 240, 192, 416, 192, 3, 8),
    ]
    for name, t_in, h, c, w_o, co, kt, bh in shapes:
        tp, hp, wp = t_in + kt - 1, h + 2, w_o + 2
        xb = jax.random.normal(key, (tp, hp, c, wp), jnp.bfloat16)
        wb = jax.random.normal(key, (3, co, kt * 3 * c), jnp.bfloat16) * 0.05
        bb = jnp.zeros((co,), jnp.bfloat16)
        flops = 2 * t_in * h * w_o * c * co * kt * 9
        t_bf = timeit(
            lambda x, w, b: _conv3d_pallas_thcw(x, w, b, kt=kt,
                                                out_dtype=jnp.bfloat16,
                                                bh_override=bh, fold=True),
            xb, wb, bb)
        print(f"{name}: bf16 kf {t_bf*1000:.1f} ms "
              f"({flops/t_bf/1e12:.0f} TF/s)", flush=True)
        xq = jax.random.randint(key, (tp, hp, c, wp), -127, 128, jnp.int8)
        wq = jax.random.randint(key, (3, co, kt * 3 * c), -127, 128,
                                jnp.int8)
        sw = jnp.full((co,), 1e-2, jnp.float32)
        try:
            t_i8 = timeit(
                lambda x, w, b, s: kf_int8(x, w, b, s, kt=kt, bh=bh,
                                           sx=1e-2),
                xq, wq, bb, sw)
            print(f"{name}: int8 kf {t_i8*1000:.1f} ms "
                  f"({flops/t_i8/1e12:.0f} TOPS eff) "
                  f"speedup x{t_bf/t_i8:.2f}", flush=True)
        except Exception as exc:
            print(f"{name}: int8 kf FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:300]}", flush=True)


if __name__ == "__main__":
    main()
