"""Probe: kf kernel reading the NATIVE NDHWC layout with the C<->W
transpose done in VMEM per block, vs the production path's HBM transpose
(xt = transpose + pad) around the thcw kernel.

Full-pipeline timing (NDHWC input -> result in NDHWC), in-jit anti-CSE.

Variants:
  kf_hbmT   production: HBM transpose+pad -> thcw kf kernel -> HBM transpose
  kf_vmemT  pad in native layout -> kernel transposes block in VMEM, dots
            as kf, transposes acc back, writes native [1,bh,w,Co]
  kf_vmemT_halfout same but output stays thcw (out transpose in HBM)
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastvideo_tpu.ops.conv3d import _conv3d_pallas_thcw
from fastvideo_tpu.utils import enable_compilation_cache

enable_compilation_cache()
try:
    from jax.experimental.pallas import Element
except ImportError:
    from jax._src.pallas.core import Element


def _kernel_native(x_ref, w_ref, b_ref, o_ref, *, kt, bh, w_out,
                   native_out):
    # x_ref: [kt, bh+2, wp, C] native; transpose block to [kt, bh+2, C, wp]
    c = x_ref.shape[-1]
    co = w_ref.shape[1]
    x = jnp.swapaxes(x_ref[...], 2, 3)
    for h in range(bh):
        xc = x[:, h:h + 3].reshape(kt * 3 * c, x.shape[-1])
        acc = jnp.zeros((co, w_out), jnp.float32)
        for dw in range(3):
            acc = acc + jnp.dot(w_ref[dw], xc[:, dw:dw + w_out],
                                preferred_element_type=jnp.float32)
        acc = acc + b_ref[...].astype(jnp.float32)
        if native_out:
            o_ref[0, h] = acc.T.astype(o_ref.dtype)
        else:
            o_ref[0, h] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kt", "bh", "native_out"))
def kf_native(x, w, b, *, kt, bh, native_out):
    # x: [tp, hp, wp, C] native pre-padded
    tp, hp, wp, c = x.shape
    t_out, h, w_out = tp - kt + 1, hp - 2, wp - 2
    co = w.shape[1]
    grid = (t_out, h // bh)
    out_shape = ((t_out, h, w_out, co) if native_out else
                 (t_out, h, co, w_out))
    out_block = ((1, bh, w_out, co) if native_out else (1, bh, co, w_out))
    return pl.pallas_call(
        functools.partial(_kernel_native, kt=kt, bh=bh, w_out=w_out,
                          native_out=native_out),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Element(kt), Element(bh + 2), Element(wp),
                          Element(c)),
                         lambda t, i: (t, i * bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(out_block, lambda t, i: (t, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_out * h * w_out * c * co * kt * 9,
            bytes_accessed=x.size * 2, transcendentals=0),
    )(x, w, b.reshape(co, 1))


def timeit(fn, *args, n=4):
    @jax.jit
    def run(x, *a):
        def body(i, acc):
            x0 = (x + jax.lax.optimization_barrier(acc).astype(jnp.float32)
                  .astype(x.dtype))
            o = fn(x0, *a)
            return jnp.max(o[..., :1, :1].astype(jnp.float32)) * 1e-30

        o = fn(x, *a)
        return o, jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    o, z = run(*args)
    float(jnp.sum(z.astype(jnp.float32)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        o, z = run(*args)
        float(jnp.sum(z.astype(jnp.float32)))
        ts.append((time.perf_counter() - t0) / (n + 1))
    return min(ts)


def main():
    key = jax.random.PRNGKey(0)
    shapes = [
        ("96ch full-res", 6, 480, 832, 96, 96, 3, 8),
        ("192ch half-res", 6, 240, 416, 192, 192, 3, 4),
    ]
    for name, t_out, h, w_o, c, co, kt, bh in shapes:
        x = jax.random.normal(key, (1, t_out, h, w_o, c), jnp.bfloat16)
        w = jax.random.normal(key, (kt, 3, 3, c, co), jnp.bfloat16) * 0.05
        b = jnp.zeros((co,), jnp.bfloat16)
        wt = w.transpose(2, 4, 0, 1, 3).reshape(3, co, kt * 3 * c)
        flops = 2 * t_out * h * w_o * c * co * kt * 9

        def hbmT(x):
            xt = jnp.pad(x.transpose(0, 1, 2, 4, 3),
                         ((0, 0), (kt - 1, 0), (1, 1), (0, 0), (1, 1)))
            o = _conv3d_pallas_thcw(xt[0], wt, b, kt=kt,
                                    out_dtype=jnp.bfloat16, fold=True)
            return o.transpose(0, 1, 3, 2)[None]

        def vmemT(x):
            xp = jnp.pad(x, ((0, 0), (kt - 1, 0), (1, 1), (1, 1), (0, 0)))
            return kf_native(xp[0], wt, b, kt=kt, bh=bh, native_out=True)[None]

        def vmemT_half(x):
            xp = jnp.pad(x, ((0, 0), (kt - 1, 0), (1, 1), (1, 1), (0, 0)))
            o = kf_native(xp[0], wt, b, kt=kt, bh=bh, native_out=False)
            return o.transpose(0, 1, 3, 2)[None]

        # correctness spot-check vs production
        ref = hbmT(x)
        for vname, fn in (("kf_vmemT", vmemT), ("kf_vmemT_halfout",
                                                vmemT_half)):
            try:
                out = fn(x)
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32) -
                                            ref.astype(jnp.float32))))
                t = timeit(fn, x)
                print(f"{name} {vname}: {t*1000:.1f} ms "
                      f"({flops/t/1e12:.0f} TF/s eff) maxerr {err:.2e}",
                      flush=True)
            except Exception as exc:
                print(f"{name} {vname}: FAILED {type(exc).__name__}: "
                      f"{str(exc)[:300]}", flush=True)
        t = timeit(hbmT, x)
        print(f"{name} kf_hbmT: {t*1000:.1f} ms ({flops/t/1e12:.0f} TF/s "
              f"eff)", flush=True)


if __name__ == "__main__":
    main()
