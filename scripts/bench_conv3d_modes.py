"""Mode sweep for the Pallas conv3d kernel at VAE decoder hot shapes.

Compares, per shape: XLA direct 3D conv, the VAE's current 2D temporal-tap
decomposition (time folded into conv batch), and every Pallas kernel mode
(tap / dw / dhw / full / nb). Prints TF/s so the fastest form per shape can
be wired into CausalConv3d.
"""
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
    print(f"{name:40s} {t*1000:8.1f} ms  {flops/t/1e12:6.1f} TF/s",
          flush=True)
    return t


def xla_3d(x, w, b, tp):
    xp = jnp.pad(x, ((0, 0), (tp, 0), (1, 1), (1, 1), (0, 0)))
    o = jax.lax.conv_general_dilated(
        xp, w, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return o + b


def xla_taps(x, w, b, tp):
    """The VAE's current form: per-temporal-tap TRUE 2D NHWC convs."""
    kt = w.shape[0]
    xp = jnp.pad(x, ((0, 0), (tp, 0), (1, 1), (1, 1), (0, 0)))
    bsz, t_in, hh, ww, cin = xp.shape
    n_out = t_in - kt + 1
    xflat = xp.reshape(bsz * t_in, hh, ww, cin)
    out = None
    for dt in range(kt):
        xt = xflat[dt:dt + n_out]
        o = jax.lax.conv_general_dilated(
            xt, w[dt], window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = o if out is None else out + o
    return out.reshape(bsz, n_out, *out.shape[1:]) + b


def main():
    key = jax.random.PRNGKey(0)
    for (t, h, w_, c, co, kt) in [
        (16, 480, 832, 96, 96, 3),
        (16, 480, 832, 96, 96, 1),
        (8, 240, 416, 192, 192, 3),
        (8, 240, 416, 192, 96, 3),
        (4, 120, 208, 384, 384, 3),
    ]:
        print(f"shape t{t} {h}x{w_} {c}->{co} kt={kt}", flush=True)
        x = jax.random.normal(key, (1, t, h, w_, c), jnp.bfloat16)
        wk = jax.random.normal(key, (kt, 3, 3, c, co), jnp.bfloat16) * 0.02
        b = jax.random.normal(key, (co,), jnp.bfloat16) * 0.1
        tp = kt - 1
        flops = 2 * t * h * w_ * c * co * kt * 9

        # fp32 small-slice reference for correctness
        xs = x[:, :4, :96, :128]
        o_ref = xla_3d(xs.astype(jnp.float32), wk.astype(jnp.float32),
                       b.astype(jnp.float32), tp)

        def check(f):
            o = f(xs, wk, b)
            return float(jnp.max(jnp.abs(o.astype(jnp.float32) - o_ref)))

        timeit(jax.jit(lambda x, w, b: xla_3d(x, w, b, tp)), x, wk, b,
               flops=flops, name="  xla 3d")
        e = check(lambda x, w, b: xla_taps(x, w, b, tp))
        timeit(jax.jit(lambda x, w, b: xla_taps(x, w, b, tp)), x, wk, b,
               flops=flops, name=f"  xla 2d-taps err={e:.4f}")
        for mode in ("tap", "dma"):
            try:
                e = check(lambda x, w, b: conv3d_ndhwc(
                    x, w, b, time_pad=tp, mode=mode))
                f = jax.jit(lambda x, w, b: conv3d_ndhwc(
                    x, w, b, time_pad=tp, mode=mode))
                timeit(f, x, wk, b, flops=flops,
                       name=f"  pallas {mode} err={e:.4f}")
            except Exception as ex:
                print(f"  pallas {mode}: FAIL {type(ex).__name__} "
                      f"{str(ex)[:90]}", flush=True)


if __name__ == "__main__":
    main()
