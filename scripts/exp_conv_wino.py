"""On-chip probe: Winograd F(2x2,3x3) vs the direct kf Pallas kernel at
the Wan decoder stage shapes.

Winograd does 16/36 of the multiplies; the printed TF/s is EFFECTIVE
(direct-conv FLOPs / time), so >197 TF/s is possible and the two
columns are directly comparable as time.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

from fastvideo_tpu.ops.conv3d import conv3d_ndhwc
from fastvideo_tpu.utils import enable_compilation_cache

enable_compilation_cache()
print(f"devices: {jax.devices()}", flush=True)

REPS = 5


def bench(name, mode, t, hh, ww, c, co):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, t, hh, ww, c), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 3, c, co), jnp.bfloat16) * 0.02
    b = jnp.zeros((co,), jnp.bfloat16)
    fl = 2 * t * hh * ww * c * co * 27

    @jax.jit
    def run(x, w, b):
        def body(i, xc):
            o = conv3d_ndhwc(xc, w, b, time_pad=2, mode=mode)
            o = jax.lax.optimization_barrier(o)
            return (x + o[..., :c] * 1e-30).astype(x.dtype)

        z = jax.lax.fori_loop(0, REPS, body, x)
        return jnp.max(z.astype(jnp.float32))

    try:
        float(run(x, w, b))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x, w, b))
            best = min(best, (time.perf_counter() - t0) / REPS)
        print(f"  {name:26s} {best*1000:8.2f} ms  {fl/best/1e12:6.1f} TF/s"
              f" effective", flush=True)
    except Exception as e:
        print(f"  {name:26s} FAIL {type(e).__name__} {str(e)[:140]}",
              flush=True)


only = sys.argv[1:]
for (t, hh, ww, c, co) in (
    (16, 480, 832, 96, 96),
    (16, 240, 416, 192, 192),
    (8, 120, 208, 384, 384),
):
    print(f"stage c={c} t={t} {hh}x{ww}", flush=True)
    for mode in ("kf", "wino"):
        if only and not any(o in mode for o in only):
            continue
        bench(f"{mode:5s} c={c}", mode, t, hh, ww, c, co)
