"""Probe: WanResidualBlock computed with activations RESIDENT in the thcw
layout [B, T, H, C, W] (no per-conv HBM transposes) vs the production
NDHWC path (transpose+pad around each kf conv).

Block = norm1/silu/conv1 + norm2/silu/conv2 + residual add, bf16,
at the decoder's full-res and half-res chunk shapes.
"""
import time

import jax
import jax.numpy as jnp

from fastvideo_tpu.ops.conv3d import _conv3d_pallas_thcw, _quantize_int8, \
    _conv3d_pallas_thcw_int8
from fastvideo_tpu.utils import enable_compilation_cache

enable_compilation_cache()


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


def norm_silu_ndhwc(x, gamma):
    sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    inv = ((x.shape[-1]**0.5) *
           jax.lax.rsqrt(jnp.maximum(sq, 1e-24))).astype(x.dtype)
    return jax.nn.silu(x * inv * gamma.astype(x.dtype))


def norm_silu_thcw(x, gamma):
    # x: [B, T, H, C, W]; reduce over C at axis -2
    sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-2, keepdims=True)
    inv = ((x.shape[-2]**0.5) *
           jax.lax.rsqrt(jnp.maximum(sq, 1e-24))).astype(x.dtype)
    return jax.nn.silu(x * inv * gamma[:, None].astype(x.dtype))


def main():
    key = jax.random.PRNGKey(0)
    shapes = [
        ("96ch full-res", 8, 480, 832, 96, 3),
        ("192ch half-res", 8, 240, 416, 192, 3),
    ]
    for name, t, h, w_o, c, kt in shapes:
        k1, k2, k3 = jax.random.split(key, 3)
        x = jax.random.normal(k1, (1, t, h, w_o, c), jnp.bfloat16)
        w1 = jax.random.normal(k2, (kt, 3, 3, c, c), jnp.bfloat16) * 0.05
        w2 = jax.random.normal(k3, (kt, 3, 3, c, c), jnp.bfloat16) * 0.05
        b = jnp.zeros((c,), jnp.bfloat16)
        g = jnp.ones((c,), jnp.bfloat16)
        w1t = w1.transpose(2, 4, 0, 1, 3).reshape(3, c, kt * 3 * c)
        w2t = w2.transpose(2, 4, 0, 1, 3).reshape(3, c, kt * 3 * c)
        flops = 2 * 2 * t * h * w_o * c * c * kt * 9

        def conv_ndhwc(x, wt):
            xt = jnp.pad(x.transpose(0, 1, 2, 4, 3),
                         ((0, 0), (kt - 1, 0), (1, 1), (0, 0), (1, 1)))
            o = _conv3d_pallas_thcw(xt[0], wt, b, kt=kt,
                                    out_dtype=jnp.bfloat16, fold=True)
            return o.transpose(0, 1, 3, 2)[None]

        def conv_thcw(xt, wt):
            # xt: [B, T, H, C, W] resident; pad halo only
            xp = jnp.pad(xt, ((0, 0), (kt - 1, 0), (1, 1), (0, 0), (1, 1)))
            return _conv3d_pallas_thcw(xp[0], wt, b, kt=kt,
                                       out_dtype=jnp.bfloat16, fold=True)[None]

        def block_ndhwc(x):
            h1 = conv_ndhwc(norm_silu_ndhwc(x, g), w1t)
            h2 = conv_ndhwc(norm_silu_ndhwc(h1, g), w2t)
            return x + h2

        def block_thcw(x):
            xt = x.transpose(0, 1, 2, 4, 3)  # one entry transpose
            h1 = conv_thcw(norm_silu_thcw(xt, g), w1t)
            h2 = conv_thcw(norm_silu_thcw(h1, g), w2t)
            return (xt + h2).transpose(0, 1, 2, 4, 3)  # one exit transpose

        def block_thcw_resident(xt):
            # steady-state: input/output already thcw
            h1 = conv_thcw(norm_silu_thcw(xt, g), w1t)
            h2 = conv_thcw(norm_silu_thcw(h1, g), w2t)
            return xt + h2

        def block_thcw_res_int8(xt):
            wq1, sw1 = _quantize_int8(w1, axes=(0, 1, 2, 3))
            wq2, sw2 = _quantize_int8(w2, axes=(0, 1, 2, 3))
            wq1t = wq1.transpose(2, 4, 0, 1, 3).reshape(3, c, kt * 3 * c)
            wq2t = wq2.transpose(2, 4, 0, 1, 3).reshape(3, c, kt * 3 * c)

            def conv_i8(xin, wqt, sw):
                xq, sx = _quantize_int8(xin, axes=None)
                xp = jnp.pad(xq, ((0, 0), (kt - 1, 0), (1, 1), (0, 0),
                                  (1, 1)))
                sc = sw.reshape(-1) * sx.reshape(())
                return _conv3d_pallas_thcw_int8(
                    xp[0], wqt, b.astype(jnp.float32), sc, kt=kt,
                    out_dtype=jnp.bfloat16)[None]

            h1 = conv_i8(norm_silu_thcw(xt, g), wq1t, sw1)
            h2 = conv_i8(norm_silu_thcw(h1, g), wq2t, sw2)
            return xt + h2

        ref = block_ndhwc(x)
        out = block_thcw(x)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) -
                                    ref.astype(jnp.float32))))
        print(f"{name}: thcw-vs-ndhwc maxerr {err:.2e}", flush=True)
        xt0 = x.transpose(0, 1, 2, 4, 3)
        for vname, fn, arg in (
                ("block_ndhwc", block_ndhwc, x),
                ("block_thcw(+edge transposes)", block_thcw, x),
                ("block_thcw_resident", block_thcw_resident, xt0),
                ("block_thcw_res_int8", block_thcw_res_int8, xt0)):
            try:
                tt = timeit(fn, arg)
                print(f"{name} {vname}: {tt*1000:.1f} ms "
                      f"({flops/tt/1e12:.0f} TF/s eff)", flush=True)
            except Exception as exc:
                print(f"{name} {vname}: FAILED {type(exc).__name__}: "
                      f"{str(exc)[:300]}", flush=True)


if __name__ == "__main__":
    main()
