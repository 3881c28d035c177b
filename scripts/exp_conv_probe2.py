"""Probe WHY conv3d tap saturates at ~66 TF/s at the 96-ch decoder stage.

Isolates, at the exact tap blocking/window shapes:
  dots      tap's 27 matmuls with ALIGNED slices only (wrong math, perf
            probe) -> is the width-shift relayout material at all?
  bt=N      temporal blocking: amortize the kt=3 overlapping-window
            refetch (3x HBM traffic in tap) across N output frames.
  k384      27 taps pre-folded to 7 K=384 dots (100% K fill) on data
            already folded in HBM (fold cost excluded) -> MXU fill ceiling.
  tpose     out^T = W^T @ X^T with pixels on lanes (N fill 100%, only K
            at 75%) -> the transposed-orientation ceiling.
  vmem=M    tap with vmem_limit_bytes raised so bigger bh compiles.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastvideo_tpu.utils import enable_compilation_cache

enable_compilation_cache()
print(f"devices: {jax.devices()}", flush=True)

T, H, W, C, CO = 16, 480, 832, 96, 96
FL = 2 * T * H * W * C * CO * 27


def bench(name, fn, *args, flops=FL):
    @jax.jit
    def run(*a):
        def body(i, acc):
            x0 = a[0] + jax.lax.optimization_barrier(acc).astype(a[0].dtype)
            o = fn(x0, *a[1:])
            return jnp.max(o.reshape(-1)[:1].astype(jnp.float32)) * 1e-30

        o = fn(*a)
        return o, jax.lax.fori_loop(0, 4, body, jnp.zeros((), jnp.float32))

    try:
        o, z = run(*args)
        float(jnp.sum(z.astype(jnp.float32)))
        t0 = time.perf_counter()
        o, z = run(*args)
        float(jnp.sum(z.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / 5
        print(f"  {name:22s} {dt*1000:8.2f} ms  {flops/dt/1e12:6.1f} TF/s",
              flush=True)
    except Exception as e:
        print(f"  {name:22s} FAIL {type(e).__name__} {str(e)[:90]}",
              flush=True)


def dots_kernel(x_ref, w_ref, o_ref, *, bh, w_out, kt, shifts):
    c = x_ref.shape[-1]
    co = o_ref.shape[-1]
    rows = bh * w_out
    acc = jnp.zeros((rows, co), jnp.float32)
    for dt in range(kt):
        for dh in range(3):
            for dw in range(3):
                off = dw if shifts else 0
                xs = x_ref[...][dt, dh:dh + bh, off:off + w_out, :]
                acc = acc + jnp.dot(xs.reshape(rows, c), w_ref[dt, dh, dw],
                                    preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(bh, w_out, co).astype(o_ref.dtype)


def make_dots(bh, shifts, vmem=None):
    kt = 3
    wp = W + 2

    def f(x, w):
        grid = (T, H // bh)
        kern = functools.partial(dots_kernel, bh=bh, w_out=W, kt=kt,
                                 shifts=shifts)
        cp = pltpu.CompilerParams(vmem_limit_bytes=vmem) if vmem else None
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((pl.Element(kt), pl.Element(bh + 2),
                              pl.Element(wp), pl.Element(C)),
                             lambda t, i: (t, i * bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bh, W, CO), lambda t, i: (t, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, H, W, CO), jnp.bfloat16),
            compiler_params=cp,
            cost_estimate=pl.CostEstimate(flops=FL, bytes_accessed=x.size * 2,
                                          transcendentals=0),
        )(x, w)

    return f


def bt_kernel(x_ref, w_ref, o_ref, *, bh, bt, w_out, kt):
    c = x_ref.shape[-1]
    co = o_ref.shape[-1]
    rows = bh * w_out
    for t in range(bt):
        acc = jnp.zeros((rows, co), jnp.float32)
        for dt in range(kt):
            for dh in range(3):
                for dw in range(3):
                    xs = x_ref[...][t + dt, dh:dh + bh, dw:dw + w_out, :]
                    acc = acc + jnp.dot(xs.reshape(rows, c),
                                        w_ref[dt, dh, dw],
                                        preferred_element_type=jnp.float32)
        o_ref[t] = acc.reshape(bh, w_out, co).astype(o_ref.dtype)


def make_bt(bh, bt, vmem=None):
    kt = 3
    wp = W + 2

    def f(x, w):
        grid = (T // bt, H // bh)
        kern = functools.partial(bt_kernel, bh=bh, bt=bt, w_out=W, kt=kt)
        cp = pltpu.CompilerParams(vmem_limit_bytes=vmem) if vmem else None
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((pl.Element(bt + kt - 1), pl.Element(bh + 2),
                              pl.Element(wp), pl.Element(C)),
                             lambda t, i: (t * bt, i * bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bt, bh, W, CO),
                                   lambda t, i: (t, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, H, W, CO), jnp.bfloat16),
            compiler_params=cp,
            cost_estimate=pl.CostEstimate(flops=FL, bytes_accessed=x.size * 2,
                                          transcendentals=0),
        )(x, w)

    return f


def k384_kernel(x_ref, w_ref, o_ref, *, bh, w_out):
    co = o_ref.shape[-1]
    rows = bh * w_out
    acc = jnp.zeros((rows, co), jnp.float32)
    for j in range(7):
        xs = x_ref[...][0, :bh, :w_out, :].reshape(rows, 384)
        acc = acc + jnp.dot(xs, w_ref[j],
                            preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(bh, w_out, co).astype(o_ref.dtype)


def make_k384(bh, vmem=None):
    def f(x, w):
        grid = (T, H // bh)
        kern = functools.partial(k384_kernel, bh=bh, w_out=W)
        cp = pltpu.CompilerParams(vmem_limit_bytes=vmem) if vmem else None
        fl = 2 * T * H * W * 7 * 384 * CO
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bh, W, 384), lambda t, i: (t, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bh, W, CO), lambda t, i: (t, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, H, W, CO), jnp.bfloat16),
            compiler_params=cp,
            cost_estimate=pl.CostEstimate(flops=fl, bytes_accessed=x.size * 2,
                                          transcendentals=0),
        )(x, w)

    return f


def tpose_kernel(x_ref, w_ref, o_ref, *, cols):
    acc = jnp.zeros((CO, cols), jnp.float32)
    for j in range(27):
        acc = acc + jnp.dot(w_ref[j], x_ref[0],
                            preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def make_tpose(cols, vmem=None):
    npix = T * H * W

    def f(x, w):
        grid = (npix // cols,)
        kern = functools.partial(tpose_kernel, cols=cols)
        cp = pltpu.CompilerParams(vmem_limit_bytes=vmem) if vmem else None
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, C, cols), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, CO, cols), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((npix // cols, CO, cols),
                                           jnp.bfloat16),
            compiler_params=cp,
            cost_estimate=pl.CostEstimate(flops=FL, bytes_accessed=x.size * 2,
                                          transcendentals=0),
        )(x, w)

    return f


key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (3 + T - 1, H + 2, W + 2, C), jnp.bfloat16)
w = jax.random.normal(key, (3, 3, 3, C, CO), jnp.bfloat16) * 0.02
only = sys.argv[1:]


def want(n):
    return not only or any(o in n for o in only)


for bh in (2, 4):
    if want("shift"):
        bench(f"tap-shifts bh={bh}", make_dots(bh, True), x, w)
        bench(f"dots-align bh={bh}", make_dots(bh, False), x, w)
for bh in (4, 8, 16):
    if want("vmem"):
        bench(f"tap vmem=96M bh={bh}", make_dots(bh, True, vmem=96 << 20),
              x, w)
for bt, bh in ((2, 2), (4, 2), (4, 4), (8, 4)):
    if want("bt"):
        bench(f"bt={bt} bh={bh} v=96M", make_bt(bh, bt, vmem=96 << 20), x, w)

if want("k384"):
    xf = jax.random.normal(key, (T, H, W, 384), jnp.bfloat16)
    wf = jax.random.normal(key, (7, 384, CO), jnp.bfloat16) * 0.02
    for bh in (2, 4, 8):
        bench(f"k384 bh={bh} v=96M", make_k384(bh, vmem=96 << 20), xf, wf,
              flops=2 * T * H * W * 7 * 384 * CO)

if want("tpose"):
    npix = T * H * W
    xt = jax.random.normal(key, (npix // 512, C, 512), jnp.bfloat16)
    wt = jax.random.normal(key, (27, CO, C), jnp.bfloat16) * 0.02
    for cols in (512, 1024, 2048):
        xt2 = xt.reshape(npix // cols, C, cols)
        bench(f"tpose cols={cols}", make_tpose(cols, vmem=96 << 20), xt2, wt)


def thcw_kernel(x_ref, w_ref, o_ref, *, bh, w_out, kt):
    # x_ref: [kt, bh+2, C, wp]; w_ref: [kt, 3, 3, CO, C]; o: [1, bh, CO, w_out]
    c = x_ref.shape[2]
    co = o_ref.shape[2]
    x = x_ref[...]
    for h in range(bh):
        acc = jnp.zeros((co, w_out), jnp.float32)
        for dt in range(kt):
            for dh in range(3):
                for dw in range(3):
                    xs = x[dt, h + dh, :, dw:dw + w_out]
                    acc = acc + jnp.dot(w_ref[dt, dh, dw], xs,
                                        preferred_element_type=jnp.float32)
        o_ref[0, h] = acc.astype(o_ref.dtype)


def make_thcw(bh, t, hh, ww, c, co, vmem=None):
    kt = 3
    wp = ww + 2

    def f(x, w):
        grid = (t, hh // bh)
        kern = functools.partial(thcw_kernel, bh=bh, w_out=ww, kt=kt)
        cp = pltpu.CompilerParams(vmem_limit_bytes=vmem) if vmem else None
        fl = 2 * t * hh * ww * c * co * 27
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((pl.Element(kt), pl.Element(bh + 2),
                              pl.Element(c), pl.Element(wp)),
                             lambda tt, i: (tt, i * bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bh, co, ww),
                                   lambda tt, i: (tt, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t, hh, co, ww), jnp.bfloat16),
            compiler_params=cp,
            cost_estimate=pl.CostEstimate(flops=fl, bytes_accessed=x.size * 2,
                                          transcendentals=0),
        )(x, w)

    return f


if want("thcw"):
    for (t, hh, ww, c, co), bhs in (
        ((16, 480, 832, 96, 96), (2, 4, 6, 8)),
        ((16, 240, 416, 192, 192), (4, 8)),
        ((8, 120, 208, 384, 384), (4, 8)),
    ):
        xh = jax.random.normal(key, (t + 2, hh + 2, c, ww + 2), jnp.bfloat16)
        wh = jax.random.normal(key, (3, 3, 3, co, c), jnp.bfloat16) * 0.02
        fl = 2 * t * hh * ww * c * co * 27
        for bh in bhs:
            if hh % bh:
                continue
            bench(f"thcw c={c} bh={bh}", make_thcw(bh, t, hh, ww, c, co,
                                                   vmem=96 << 20),
                  xh, wh, flops=fl)
