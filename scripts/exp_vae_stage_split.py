"""Per-stage timing of the Wan VAE decoder on-chip.

Splits the decoder pyramid at stage boundaries into separate jitted
programs at one chunk's shapes (chunk_frames latent frames) and times each
with an in-jit repeat loop (kills tunnel-RTT noise). Prints the stage
split + implied TF/s so the optimization target is explicit.

Usage: exp_vae_stage_split.py [chunk=4] [mode=tap]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
from flax import nnx

chunk = 4
mode = "tap"
for a in sys.argv[1:]:
    if a.startswith("chunk="):
        chunk = int(a.split("=")[1])
    if a.startswith("mode="):
        mode = a.split("=")[1]
os.environ["FASTVIDEO_VAE_CONV3D"] = "" if mode == "xla" else mode

from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig
from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan
from fastvideo_tpu.utils import enable_compilation_cache

enable_compilation_cache()
print(f"devices: {jax.devices()} chunk={chunk} mode={mode}", flush=True)

vae = AutoencoderKLWan(WanVAEArchConfig(), load_encoder=False,
                       param_dtype=jnp.bfloat16, rngs=nnx.Rngs(1))
dec = vae.decoder
H, W = 60, 104


def timed(name, module, x_shape, flops=None, **kw):
    graphdef, st = nnx.split(module)

    @jax.jit
    def run(st, x):
        m = nnx.merge(graphdef, st)

        def body(i, acc):
            xb = x + jax.lax.optimization_barrier(acc).astype(x.dtype)
            o = m(xb, **kw)
            return jnp.max(o[..., :1].astype(jnp.float32)) * 1e-30

        out = m(x, **kw)
        # 4 extra reps riding one dispatch (carry feeds back into the input
        # so XLA cannot CSE the repeats away)
        return out, jax.lax.fori_loop(0, 4, body,
                                      jnp.zeros((), jnp.float32))

    x = jax.random.normal(jax.random.PRNGKey(0), x_shape, jnp.bfloat16)
    out, _ = run(st, x)
    float(jnp.sum(out[:1, :1, :1, :1, :1].astype(jnp.float32)))  # settle
    dt = float("inf")
    for _ in range(3):  # min-of-3: the tunnel adds 100ms+ hiccups
        t0 = time.perf_counter()
        out, z = run(st, x)
        float(jnp.sum(z.astype(jnp.float32)))
        dt = min(dt, (time.perf_counter() - t0) / 5)
    tfs = f" {flops/dt/1e12:6.1f} TF/s" if flops else ""
    print(f"{name:28s} in={str(x_shape):24s} out={tuple(out.shape)} "
          f"{dt*1000:7.1f} ms{tfs}", flush=True)
    return dt


def conv_flops(t, h, w, cin, cout, k=27):
    return 2 * t * h * w * cin * cout * k


total = 0.0
t = chunk
# conv_in + mid at latent res, 16->384, then mid (4 convs 384 + attn)
fl = conv_flops(t, H, W, 16, 384) + 4 * conv_flops(t, H, W, 384, 384) \
    + 4 * conv_flops(t, H, W, 384, 384, 1) + 2 * 2 * t * (H * W)**2 * 384
total += timed("conv_in", dec.conv_in, (1, t, H, W, 16),
               flops=conv_flops(t, H, W, 16, 384))
total += timed("mid_block", dec.mid_block, (1, t, H, W, 384),
               flops=4 * conv_flops(t, H, W, 384, 384)
               + 4 * conv_flops(t, H, W, 384, 384, 1)
               + 2 * 2 * t * (H * W)**2 * 384)
# up0: 3 resnets 384->384 + upsample3d (time conv 384->768 + spatial conv)
fl = 6 * conv_flops(t, H, W, 384, 384) + conv_flops(t, H, W, 384, 768, 3) \
    + conv_flops(2 * t, 2 * H, 2 * W, 384, 192, 9)
total += timed("up0 (384, up3d)", dec.up_blocks[0], (1, t, H, W, 384),
               flops=fl, first_len=0)
t2, H2, W2 = 2 * t, 2 * H, 2 * W
fl = (conv_flops(t2, H2, W2, 192, 384) + conv_flops(t2, H2, W2, 192, 384, 1)
      + 5 * conv_flops(t2, H2, W2, 384, 384)
      + conv_flops(t2, H2, W2, 384, 768, 3)
      + conv_flops(2 * t2, 2 * H2, 2 * W2, 384, 192, 9))
total += timed("up1 (192->384, up3d)", dec.up_blocks[1],
               (1, t2, H2, W2, 192), flops=fl, first_len=0)
t3, H3, W3 = 2 * t2, 2 * H2, 2 * W2
fl = (conv_flops(t3, H3, W3, 192, 192) + 5 * conv_flops(t3, H3, W3, 192, 192)
      + conv_flops(t3, 2 * H3, 2 * W3, 192, 96, 9))
total += timed("up2 (192, up2d)", dec.up_blocks[2], (1, t3, H3, W3, 192),
               flops=fl, first_len=0)
H4, W4 = 2 * H3, 2 * W3
fl = 6 * conv_flops(t3, H4, W4, 96, 96)
total += timed("up3 (96)", dec.up_blocks[3], (1, t3, H4, W4, 96),
               flops=fl, first_len=0)
total += timed("conv_out", dec.conv_out, (1, t3, H4, W4, 96),
               flops=conv_flops(t3, H4, W4, 96, 3))
n_chunks = -(-20 // chunk)
print(f"sum per-chunk stages: {total*1000:.0f} ms -> x{n_chunks} chunks "
      f"= {total*n_chunks:.2f} s (+ first-frame chunk)", flush=True)
