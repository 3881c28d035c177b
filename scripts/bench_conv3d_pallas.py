"""Bench/verify the Pallas conv3d kernel vs XLA at VAE decoder shapes."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from fastvideo_tpu.ops.conv3d import conv3d_ndhwc


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, n=3, flops=0, name=""):
    sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{name:44s} {t*1000:8.1f} ms  {flops/t/1e12:6.1f} TF/s")
    return t


def ref_conv(x, w, b, time_pad):
    xp = jnp.pad(x, ((0, 0), (time_pad, 0), (1, 1), (1, 1), (0, 0)))
    o = jax.lax.conv_general_dilated(
        xp, w, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return o + b


def main():
    key = jax.random.PRNGKey(0)
    for (t, h, w_, c, co, kt) in [
        (16, 480, 832, 96, 96, 3),
        (16, 480, 832, 96, 96, 1),
        (8, 240, 416, 192, 96, 3),
        (4, 120, 208, 384, 192, 3),
    ]:
        x = jax.random.normal(key, (1, t, h, w_, c), jnp.bfloat16)
        wk = jax.random.normal(key, (kt, 3, 3, c, co), jnp.bfloat16) * 0.02
        b = jax.random.normal(key, (co,), jnp.bfloat16) * 0.1
        tp = kt - 1
        flops = 2 * t * h * w_ * c * co * kt * 9

        # correctness (small slice, fp32 compare — full-res fp32 ref OOMs)
        xs = x[:, :4, :96, :128]
        o_ref = ref_conv(xs.astype(jnp.float32), wk.astype(jnp.float32),
                         b.astype(jnp.float32), tp)
        o_pal = conv3d_ndhwc(xs, wk, b, time_pad=tp)
        err = float(jnp.max(jnp.abs(o_pal.astype(jnp.float32) - o_ref)))
        scale = float(jnp.max(jnp.abs(o_ref)))
        print(f"shape t{t} {h}x{w_} {c}->{co} kt={kt}: "
              f"max_err={err:.4f} (scale {scale:.1f})")

        f_xla = jax.jit(lambda x, w, b: ref_conv(x, w, b, tp))
        timeit(f_xla, x, wk, b, flops=flops, name="  xla conv3d")
        for mode, bh in (("tap", None), ("nb", None), ("nb", 2), ("nb", 4)):
            try:
                o_pal = conv3d_ndhwc(xs, wk, b, time_pad=tp, mode=mode,
                                     bh_override=bh)
                err = float(jnp.max(jnp.abs(o_pal.astype(jnp.float32)
                                            - o_ref)))
                f_pal = jax.jit(lambda x, w, b: conv3d_ndhwc(
                    x, w, b, time_pad=tp, mode=mode, bh_override=bh))
                timeit(f_pal, x, wk, b, flops=flops,
                       name=f"  pallas {mode} bh={bh} err={err:.4f}")
            except Exception as e:
                print(f"  pallas {mode} bh={bh}: FAIL "
                      f"{type(e).__name__} {str(e)[:90]}")

    # fused rms+silu+conv vs unfused pair
    t, h, w_, c = 16, 480, 832, 96
    x = jax.random.normal(key, (1, t, h, w_, c), jnp.bfloat16)
    wk = jax.random.normal(key, (3, 3, 3, c, c), jnp.bfloat16) * 0.02
    b = jnp.zeros((c,), jnp.bfloat16)
    g = jax.random.normal(key, (c,), jnp.bfloat16)
    flops = 2 * t * h * w_ * c * c * 27

    def rms_silu(x):
        sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                     keepdims=True)
        inv = (c**0.5 * jax.lax.rsqrt(jnp.maximum(sq, 1e-24)))
        xn = (x.astype(jnp.float32) * inv * g.astype(jnp.float32))
        return (xn * jax.nn.sigmoid(xn)).astype(x.dtype)

    f_fused = jax.jit(
        lambda x, w, b: conv3d_ndhwc(x, w, b, time_pad=2, gamma=g))
    f_unfused = jax.jit(
        lambda x, w, b: conv3d_ndhwc(rms_silu(x), w, b, time_pad=2))
    o1, o2 = f_fused(x, wk, b), f_unfused(x, wk, b)
    print(f"fused-vs-unfused max diff: "
          f"{float(jnp.max(jnp.abs(o1.astype(jnp.float32)-o2.astype(jnp.float32)))):.4f}")
    timeit(f_unfused, x, wk, b, flops=flops, name="  rms+silu, then conv")
    timeit(f_fused, x, wk, b, flops=flops, name="  fused rms+silu+conv")


if __name__ == "__main__":
    main()
