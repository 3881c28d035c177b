"""Microbenchmark: Wan VAE decoder hot-conv strategies on the real TPU.

The decoder's last pyramid stage convolves [1, T, 480, 832, 96] with 3x3x3
kernels (96->96). bench.py shows decode at ~4.7s; this isolates where the
time goes and which conv formulation XLA lowers best on v5e.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

T, H, W, C = 16, 480, 832, 96


def sync(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, n=3, flops=None, name=""):
    sync(fn(*args))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    t = min(times)
    tfs = (flops / t / 1e12) if flops else 0.0
    print(f"{name:42s} {t * 1000:8.1f} ms   {tfs:6.1f} TF/s")
    return t


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, T + 2, H + 2, W + 2, C), jnp.bfloat16)
    w3 = jax.random.normal(key, (3, 3, 3, C, C), jnp.bfloat16) * 0.05
    flops = 2 * T * H * W * C * C * 27
    print(f"hot conv shape [1,{T},{H},{W},{C}] k=3x3x3: {flops/1e12:.1f} TFLOP")

    # A: plain XLA 3D conv
    @jax.jit
    def conv3d(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    timeit(conv3d, x, w3, flops=flops, name="A xla conv3d (3,3,3)")

    # B: 3 temporal taps of (1,3,3) 3D convs
    @jax.jit
    def conv_tap5d(x, w):
        out = None
        for dt in range(3):
            o = jax.lax.conv_general_dilated(
                x[:, dt:dt + T], w[dt:dt + 1], window_strides=(1, 1, 1),
                padding="VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            out = o if out is None else out + o
        return out

    timeit(conv_tap5d, x, w3, flops=flops, name="B taps 3x (1,3,3) 5d")

    # C: 2D conv w/ T folded into batch, 3 taps summed
    @jax.jit
    def conv_tap4d(x, w):
        x4 = x[0]  # [T+2, H+2, W+2, C]
        out = None
        for dt in range(3):
            o = jax.lax.conv_general_dilated(
                x4[dt:dt + T], w[dt], window_strides=(1, 1),
                padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = o if out is None else out + o
        return out[None]

    timeit(conv_tap4d, x, w3, flops=flops, name="C taps 3x 2d batch=T")

    # D: channels padded to 128
    xp = jnp.pad(x, ((0, 0),) * 4 + ((0, 32),))
    wp = jnp.pad(w3, ((0, 0),) * 3 + ((0, 32), (0, 32)))
    flops128 = 2 * T * H * W * 128 * 128 * 27
    timeit(conv3d, xp, wp, flops=flops128, name="D xla conv3d C=128 (padded)")
    timeit(conv_tap4d, xp, wp, flops=flops128, name="E taps 2d C=128 (padded)")

    # F: 27-tap accumulated matmul (einsum)
    @jax.jit
    def conv_mm(x, w):
        out = None
        for dt in range(3):
            for dh in range(3):
                for dw in range(3):
                    xs = x[0, dt:dt + T, dh:dh + H, dw:dw + W]
                    o = jnp.einsum("thwc,cd->thwd", xs, w[dt, dh, dw],
                                   preferred_element_type=jnp.float32)
                    out = o if out is None else out + o
        return out.astype(jnp.bfloat16)[None]

    timeit(conv_mm, x, w3, flops=flops, name="F 27-tap matmul accum")

    # G: single big matmul, W-dim im2col via channel concat (27*96=2592 K)
    @jax.jit
    def conv_im2col(x, w):
        cols = []
        for dt in range(3):
            for dh in range(3):
                for dw in range(3):
                    cols.append(x[0, dt:dt + T, dh:dh + H, dw:dw + W])
        xc = jnp.concatenate(cols, axis=-1)  # [T,H,W,27C]
        wf = w.reshape(27 * C, C)
        return jnp.einsum("thwk,kd->thwd", xc, wf,
                          preferred_element_type=jnp.float32).astype(
                              jnp.bfloat16)[None]

    timeit(conv_im2col, x, w3, flops=flops, name="G im2col concat matmul")

    # pointwise ops at this scale, for reference
    @jax.jit
    def rms_silu(x):
        sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                     keepdims=True)
        inv = (C**0.5 * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))).astype(x.dtype)
        return jax.nn.silu(x * inv)

    timeit(rms_silu, x, name="H rmsnorm+silu (VPU/HBM bound)")

    # time conv (3,1,1) upsample3d shape at quarter res
    xt = jax.random.normal(key, (1, 10, 240, 416, 96), jnp.bfloat16)
    wt = jax.random.normal(key, (3, 1, 1, 96, 192), jnp.bfloat16) * 0.05
    ft = 2 * 8 * 240 * 416 * 96 * 192 * 3

    @jax.jit
    def time_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    timeit(time_conv, xt, wt, flops=ft, name="I time conv (3,1,1) 96->192")


if __name__ == "__main__":
    main()
