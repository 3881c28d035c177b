"""In-jit microbench of conv strategies at the Wan decoder's hot shapes.

Times each strategy with 5 repeats riding one dispatch (tunnel-RTT free).
Strategies: xla (direct NDHWC), tap/nb (Pallas, with bh overrides), fold
(im2col over taps -> one big K matmul, for tiny-channel convs).
"""
import sys
import time

import jax
import jax.numpy as jnp

from fastvideo_tpu.ops import conv3d as ops
from fastvideo_tpu.utils import enable_compilation_cache

enable_compilation_cache()
print(f"devices: {jax.devices()}", flush=True)

CASES = {
    "conv_in": (4, 60, 104, 16, 384),
    "up1res": (8, 120, 208, 384, 384),
    "up2res": (16, 240, 416, 192, 192),
    "up3res": (16, 480, 832, 96, 96),
    "conv_out": (16, 480, 832, 96, 3),
}
only = [a for a in sys.argv[1:] if not a.startswith("s=")]


def bench(name, fn, *args, flops):
    @jax.jit
    def run(*a):
        def body(i, acc):
            x0 = a[0] + jax.lax.optimization_barrier(acc).astype(a[0].dtype)
            o = fn(x0, *a[1:])
            return jnp.max(o[..., :1].astype(jnp.float32)) * 1e-30

        o = fn(*a)
        return o, jax.lax.fori_loop(0, 4, body, jnp.zeros((), jnp.float32))

    try:
        o, z = run(*args)
        float(jnp.sum(z.astype(jnp.float32)))
        t0 = time.perf_counter()
        o, z = run(*args)
        float(jnp.sum(z.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / 5
        print(f"  {name:24s} {dt*1000:8.2f} ms  {flops/dt/1e12:6.1f} TF/s",
              flush=True)
    except Exception as e:
        print(f"  {name:24s} FAIL {type(e).__name__} {str(e)[:100]}",
              flush=True)


def xla_direct(x, w, b):
    xp = jnp.pad(x, ((0, 0), (2, 0), (1, 1), (1, 1), (0, 0)))
    o = jax.lax.conv_general_dilated(
        xp, w, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return o + b


def fold_matmul(x, w, b):
    """im2col over all 27 taps -> single [rows, 27C] @ [27C, Co] matmul.
    Only sane when C is small (memory = 27x input)."""
    kt = w.shape[0]
    xp = jnp.pad(x, ((0, 0), (kt - 1, 0), (1, 1), (1, 1), (0, 0)))
    B, T, H, W, C = xp.shape
    t_out, h_out, w_out = T - kt + 1, H - 2, W - 2
    cols = [
        xp[:, dt:dt + t_out, dh:dh + h_out, dw:dw + w_out, :]
        for dt in range(kt) for dh in range(3) for dw in range(3)
    ]
    xc = jnp.concatenate(cols, axis=-1)
    wf = w.reshape(kt * 9 * C, -1)
    return jnp.einsum("bthwc,cd->bthwd", xc, wf) + b


def tap_fold_w(x, w, b):
    """Fold only the 3 width taps into K (K=3C), leaving kt*3 dots in XLA.
    Memory = 3x input."""
    kt = w.shape[0]
    xp = jnp.pad(x, ((0, 0), (kt - 1, 0), (1, 1), (1, 1), (0, 0)))
    B, T, H, W, C = xp.shape
    t_out, h_out, w_out = T - kt + 1, H - 2, W - 2
    xw = jnp.concatenate([xp[:, :, :, dw:dw + w_out, :] for dw in range(3)],
                         axis=-1)  # [B,T,H,w_out,3C]
    out = None
    ww = w.transpose(0, 1, 3, 2, 4).reshape(kt, 3, 3 * C, -1)  # [kt,kh,3C,Co]
    for dt in range(kt):
        for dh in range(3):
            xs = xw[:, dt:dt + t_out, dh:dh + h_out]
            o = jnp.einsum("bthwc,cd->bthwd", xs, ww[dt, dh])
            out = o if out is None else jax.lax.optimization_barrier(out + o)
    return out + b


for name, (t, h, w_, cin, cout) in CASES.items():
    if only and name not in only:
        continue
    x = jax.random.normal(jax.random.PRNGKey(0), (1, t, h, w_, cin),
                          jnp.bfloat16)
    wg = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, cin, cout),
                           jnp.bfloat16) * 0.02
    b = jnp.zeros((cout,), jnp.bfloat16)
    fl = 2 * t * h * w_ * cin * cout * 27
    print(f"{name} [{t},{h},{w_},{cin}->{cout}] {fl/1e9:.0f} GFLOP",
          flush=True)
    bench("xla-direct", xla_direct, x, wg, b, flops=fl)
    bench("tap", lambda xx, ww, bb: ops.conv3d_ndhwc(
        xx, ww, bb, time_pad=2, mode="tap"), x, wg, b, flops=fl)
    for bh in (8, 16):
        bench(f"tap bh={bh}", lambda xx, ww, bb, bh=bh: ops.conv3d_ndhwc(
            xx, ww, bb, time_pad=2, mode="tap", bh_override=bh), x, wg, b,
            flops=fl)
    bench("nb", lambda xx, ww, bb: ops.conv3d_ndhwc(
        xx, ww, bb, time_pad=2, mode="nb"), x, wg, b, flops=fl)
    bench("hoist", lambda xx, ww, bb: ops.conv3d_ndhwc(
        xx, ww, bb, time_pad=2, mode="hoist"), x, wg, b, flops=fl)
    if ops.supports((3, 3, 3), (1, 1, 1), (2, 1, 1), cin, cout):
        bench("thcw", lambda xx, ww, bb: ops.conv3d_ndhwc(
            xx, ww, bb, time_pad=2, mode="thcw"), x, wg, b, flops=fl)
    bench("auto", lambda xx, ww, bb: ops.conv3d_ndhwc(
        xx, ww, bb, time_pad=2, mode="auto"), x, wg, b, flops=fl)
    bench("shift3", lambda xx, ww, bb: ops.conv3d_ndhwc(
        xx, ww, bb, time_pad=2, mode="shift3"), x, wg, b, flops=fl)
    for bh in (2, 4):
        bench(f"shift3 bh={bh}", lambda xx, ww, bb, bh=bh: ops.conv3d_ndhwc(
            xx, ww, bb, time_pad=2, mode="shift3", bh_override=bh), x, wg, b,
            flops=fl)
    if cin <= 32:
        bench("fold27", fold_matmul, x, wg, b, flops=fl)
    bench("fold_w(K=3C)", tap_fold_w, x, wg, b, flops=fl)
