"""Probe: which conv3d Pallas modes compile+run on this chip, at a small
decoder-like shape, vs the XLA tap fallback. Prints per-mode status+time."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fastvideo_tpu.ops import conv3d as ops

shape = sys.argv[1] if len(sys.argv) > 1 else "8,60,104,256,256"
t, h, w, cin, cout = (int(x) for x in shape.split(","))

x = jax.random.normal(jax.random.PRNGKey(0), (1, t, h, w, cin),
                      jnp.bfloat16)
wgt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, cin, cout),
                        jnp.bfloat16) * 0.02
b = jnp.zeros((cout,), jnp.bfloat16)


def sync(o):
    return float(jnp.sum(o[:1, :1, :1, :1, :1].astype(jnp.float32)))


# XLA reference (direct conv)
def xla_conv(x, wgt, b):
    xp = jnp.pad(x, ((0, 0), (2, 0), (1, 1), (1, 1), (0, 0)))
    o = jax.lax.conv_general_dilated(
        xp, wgt, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return o + b


ref = None
t0 = time.perf_counter()
try:
    f = jax.jit(xla_conv)
    ref = f(x, wgt, b)
    sync(ref)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(f(x, wgt, b))
    print(f"xla-direct: ok cold={cold:.1f}s warm={time.perf_counter()-t0:.3f}s",
          flush=True)
except Exception as e:
    print(f"xla-direct: FAIL {type(e).__name__} {str(e)[:200]}", flush=True)

for mode in ("tap", "nb", "dma", "dw", "dhw"):
    t0 = time.perf_counter()
    try:
        o = ops.conv3d_ndhwc(x, wgt, b, time_pad=2, mode=mode)
        sync(o)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(ops.conv3d_ndhwc(x, wgt, b, time_pad=2, mode=mode))
        warm = time.perf_counter() - t0
        err = ""
        if ref is not None:
            err = f" maxerr={float(jnp.max(jnp.abs((o - ref).astype(jnp.float32)))):.4f}"
        flops = 2 * t * h * w * cin * cout * 27
        print(f"{mode}: ok cold={cold:.1f}s warm={warm:.3f}s "
              f"({flops/warm/1e12:.1f} TF/s){err}", flush=True)
    except Exception as e:
        print(f"{mode}: FAIL {type(e).__name__} {str(e)[:300]}", flush=True)
