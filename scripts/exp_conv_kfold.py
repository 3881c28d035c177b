"""Probe: thcw with the (dt, dh) taps FOLDED into the contraction dim.

thcw (round-4 production) does 27 dots of [Co, C] @ [C, W] per output row:
K = C = 96 pads to 128 (75% fill, ceiling ~148 TF/s) and every dot's fp32
accumulator add is VPU work. In the thcw block layout [kt, bh+2, C, wp]
the dt/dh tap slices live on MAJOR dims, so stacking all kt*3 of them
along the sublane (C) axis is full-tile register stacking (C % 16 == 0
for bf16) — no relayout, no HBM fold. That turns the row into 3 dots
(dw only) of [Co, kt*3*C] @ [kt*3*C, W]: K = 864 pads to 896 (96.4%
fill, ceiling ~190 TF/s) and 9x fewer accumulator adds.

Variants probed at the real decoder stage shapes:
  thcw      round-4 baseline (27 K=96 dots)
  kf-dh     fold dh only: 9 dots of K=3C
  kf-all    fold dt+dh: 3 dots of K=kt*3*C
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


def bench(name, fn, *args, flops):
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
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o, z = run(*args)
            float(jnp.sum(z.astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / 5)
        print(f"  {name:26s} {best*1000:8.2f} ms  {flops/best/1e12:6.1f} TF/s",
              flush=True)
    except Exception as e:
        print(f"  {name:26s} FAIL {type(e).__name__} {str(e)[:120]}",
              flush=True)


def thcw_kernel(x_ref, w_ref, o_ref, *, bh, w_out, kt, fold):
    # x_ref: [kt, bh+2, C, wp]; o: [1, bh, CO, w_out]
    c = x_ref.shape[2]
    co = o_ref.shape[2]
    x = x_ref[...]
    for h in range(bh):
        acc = jnp.zeros((co, w_out), jnp.float32)
        if fold == "none":
            # w_ref: [kt, 3, 3, CO, C]
            for dt in range(kt):
                for dh in range(3):
                    for dw in range(3):
                        xs = x[dt, h + dh, :, dw:dw + w_out]
                        acc = acc + jnp.dot(w_ref[dt, dh, dw], xs,
                                            preferred_element_type=jnp.float32)
        elif fold == "dh":
            # w_ref: [kt, 3(dw), CO, 3C]
            for dt in range(kt):
                xc = jnp.concatenate([x[dt, h + dh] for dh in range(3)],
                                     axis=0)  # [3C, wp] sublane-tile stack
                for dw in range(3):
                    acc = acc + jnp.dot(w_ref[dt, dw],
                                        xc[:, dw:dw + w_out],
                                        preferred_element_type=jnp.float32)
        elif fold == "all":
            # w_ref: [3(dw), CO, kt*3*C]
            xc = jnp.concatenate(
                [x[dt, h + dh] for dt in range(kt) for dh in range(3)],
                axis=0)  # [kt*3*C, wp]
            for dw in range(3):
                acc = acc + jnp.dot(w_ref[dw], xc[:, dw:dw + w_out],
                                    preferred_element_type=jnp.float32)
        elif fold == "rs":
            # same math as kf-all, but the (dt, dh, C) row stack is a
            # contiguous RESHAPE VIEW of x[:, h:h+3] instead of a concat
            xc = x[:, h:h + 3].reshape(kt * 3 * c, x.shape[-1])
            for dw in range(3):
                acc = acc + jnp.dot(w_ref[dw], xc[:, dw:dw + w_out],
                                    preferred_element_type=jnp.float32)
        elif fold == "fix":
            # WRONG MATH perf ceiling: aligned rows, no per-h variation
            xc = x[:, 0:3].reshape(kt * 3 * c, x.shape[-1])
            for dw in range(3):
                acc = acc + jnp.dot(w_ref[dw], xc[:, 0:w_out],
                                    preferred_element_type=jnp.float32)
        else:  # m3: dw blocks stacked on M -> ONE dot per row, M=3*Co
            # w_ref: [3*CO, kt*3*C]
            wp = x.shape[-1]
            xc = jnp.concatenate(
                [x[dt, h + dh] for dt in range(kt) for dh in range(3)],
                axis=0)  # [kt*3*C, wp]
            y = jnp.dot(w_ref[...], xc,
                        preferred_element_type=jnp.float32)  # [3Co, wp]
            acc = (y[0:co, 0:w_out] + y[co:2 * co, 1:w_out + 1] +
                   y[2 * co:3 * co, 2:w_out + 2])
        o_ref[0, h] = acc.astype(o_ref.dtype)


def make(bh, t, hh, ww, c, co, fold, vmem=96 << 20):
    kt = 3
    wp = ww + 2

    def f(x, w):
        grid = (t, hh // bh)
        kern = functools.partial(thcw_kernel, bh=bh, w_out=ww, kt=kt,
                                 fold=fold)
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
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
            cost_estimate=pl.CostEstimate(flops=fl, bytes_accessed=x.size * 2,
                                          transcendentals=0),
        )(x, w)

    return f


key = jax.random.PRNGKey(0)
only = sys.argv[1:]


def want(n):
    return not only or any(o in n for o in only)


for (t, hh, ww, c, co), bhs in (
    ((16, 480, 832, 96, 96), (2, 4, 8, 16)),
    ((16, 240, 416, 192, 192), (4, 8)),
    ((8, 120, 208, 384, 384), (4, 8)),
):
    xh = jax.random.normal(key, (t + 2, hh + 2, c, ww + 2), jnp.bfloat16)
    w0 = jax.random.normal(key, (3, 3, 3, c, co), jnp.bfloat16) * 0.02
    # [kt,3,3,C,Co] -> fold=none [kt,3,3,Co,C]
    wn = w0.transpose(0, 1, 2, 4, 3)
    # fold=dh: rows ordered (dh, C) -> [kt, dw, Co, 3C]
    wdh = w0.transpose(0, 2, 4, 1, 3).reshape(3, 3, co, 3 * c)
    # fold=all: rows ordered (dt, dh, C) -> [dw, Co, kt*3*C]
    wall = w0.transpose(2, 4, 0, 1, 3).reshape(3, co, 9 * c)
    # fold=m3: dw blocks stacked on M -> [3*Co, kt*3*C]
    wm3 = wall.reshape(3 * co, 9 * c)
    fl = 2 * t * hh * ww * c * co * 27
    print(f"stage c={c} t={t} {hh}x{ww}", flush=True)
    for bh in bhs:
        if hh % bh:
            continue
        if want("none"):
            bench(f"thcw      c={c} bh={bh}",
                  make(bh, t, hh, ww, c, co, "none"), xh, wn, flops=fl)
        if want("dh"):
            bench(f"kf-dh     c={c} bh={bh}",
                  make(bh, t, hh, ww, c, co, "dh"), xh, wdh, flops=fl)
        if want("all"):
            bench(f"kf-all    c={c} bh={bh}",
                  make(bh, t, hh, ww, c, co, "all"), xh, wall, flops=fl)
        if want("m3"):
            bench(f"kf-m3     c={c} bh={bh}",
                  make(bh, t, hh, ww, c, co, "m3"), xh, wm3, flops=fl)
        if want("rs"):
            bench(f"kf-rs     c={c} bh={bh}",
                  make(bh, t, hh, ww, c, co, "rs"), xh, wall, flops=fl)
        if want("fix"):
            bench(f"kf-fix*   c={c} bh={bh}",
                  make(bh, t, hh, ww, c, co, "fix"), xh, wall, flops=fl)
