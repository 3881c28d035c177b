"""Isolate where the int8 decode-conv win goes: full-pipeline timing
(NDHWC input -> transpose/pad/quantize -> kernel) at the decoder's hot
shapes, in-jit with anti-CSE repeats.

Variants:
  bf16       transpose+pad bf16 -> bf16 kf kernel (production default)
  i8_before  quantize NDHWC -> transpose+pad int8 -> int8 kernel (current
             auto_int8 ordering; the transpose is a 1-byte relayout)
  i8_after   transpose+pad bf16 -> quantize in thcw layout -> int8 kernel
             (no int8 relayout; extra bf16 read + int8 write)
"""
import time

import jax
import jax.numpy as jnp

from fastvideo_tpu.ops.conv3d import (_conv3d_pallas_thcw,
                                      _conv3d_pallas_thcw_int8,
                                      _quantize_int8)
from fastvideo_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def timeit(fn, *args, n=4):
    @jax.jit
    def run(x, *a):
        def body(i, acc):
            x0 = (x + jax.lax.optimization_barrier(acc).astype(jnp.float32)
                  .astype(x.dtype))
            o = fn(x0, *a)
            return jnp.max(o[..., :1].astype(jnp.float32)) * 1e-30

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
    # (name, T_out, H, W, C, Co, kt)
    shapes = [
        ("96ch full-res", 6, 480, 832, 96, 96, 3),
        ("192ch half-res", 6, 240, 416, 192, 192, 3),
    ]
    for name, t_out, h, w_o, c, co, kt in shapes:
        x = jax.random.normal(key, (1, t_out, h, w_o, c), jnp.bfloat16)
        w = jax.random.normal(key, (kt, 3, 3, c, co), jnp.bfloat16) * 0.05
        b = jnp.zeros((co,), jnp.float32)
        wt_b = w.transpose(2, 4, 0, 1, 3).reshape(3, co, kt * 3 * c)
        wq, sw = _quantize_int8(w, axes=(0, 1, 2, 3))
        wqt = wq.transpose(2, 4, 0, 1, 3).reshape(3, co, kt * 3 * c)
        flops = 2 * t_out * h * w_o * c * co * kt * 9

        def bf16(x):
            xt = jnp.pad(x.transpose(0, 1, 2, 4, 3),
                         ((0, 0), (kt - 1, 0), (1, 1), (0, 0), (1, 1)))
            return _conv3d_pallas_thcw(xt[0], wt_b, b.astype(jnp.bfloat16),
                                       kt=kt, out_dtype=jnp.bfloat16,
                                       fold=True)

        def i8_before(x):
            xq, sx = _quantize_int8(x, axes=None)
            scale = sw.reshape(-1) * sx.reshape(())
            xt = jnp.pad(xq.transpose(0, 1, 2, 4, 3),
                         ((0, 0), (kt - 1, 0), (1, 1), (0, 0), (1, 1)))
            return _conv3d_pallas_thcw_int8(xt[0], wqt, b, scale, kt=kt,
                                            out_dtype=jnp.bfloat16)

        def i8_after(x):
            xt = jnp.pad(x.transpose(0, 1, 2, 4, 3),
                         ((0, 0), (kt - 1, 0), (1, 1), (0, 0), (1, 1)))
            xq, sx = _quantize_int8(xt, axes=None)
            scale = sw.reshape(-1) * sx.reshape(())
            return _conv3d_pallas_thcw_int8(xq[0], wqt, b, scale, kt=kt,
                                            out_dtype=jnp.bfloat16)

        for vname, fn in (("bf16", bf16), ("i8_before", i8_before),
                          ("i8_after", i8_after)):
            try:
                t = timeit(fn, x)
                print(f"{name} {vname}: {t*1000:.1f} ms "
                      f"({flops/t/1e12:.0f} TF/s eff)", flush=True)
            except Exception as exc:
                print(f"{name} {vname}: FAILED {type(exc).__name__}: "
                      f"{str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
