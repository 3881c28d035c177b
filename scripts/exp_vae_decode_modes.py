"""On-chip sweep: VAE decode_dispatched across FASTVIDEO_VAE_CONV3D modes
and chunk sizes, isolated and with a simulated resident 1.3B DiT.

Usage: python scripts/exp_vae_decode_modes.py [resident] [modes=dma,tap,...]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig
from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan


def sync(x):
    return float(jnp.sum(x[:1, :1, :1, :1, :1].astype(jnp.float32)))


def main():
    from fastvideo_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}", flush=True)
    resident = "resident" in sys.argv
    modes = ["", "dma"]
    chunks = [2, 3, 4, 6]
    for a in sys.argv[1:]:
        if a.startswith("modes="):
            modes = a.split("=", 1)[1].split(",")
            modes = ["" if m == "xla" else m for m in modes]
        if a.startswith("chunks="):
            chunks = [int(c) for c in a.split("=", 1)[1].split(",")]
    ballast = None
    if resident:
        ballast = jax.device_put(jnp.zeros((1_300_000_000,), jnp.bfloat16))
        float(jnp.sum(ballast[:1]))
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 21, 60, 104),
                          jnp.bfloat16)
    for mode in modes:
        os.environ["FASTVIDEO_VAE_CONV3D"] = mode
        for chunk in chunks:
            # fresh instance per cell: decode_dispatched caches jitted fns
            vae = AutoencoderKLWan(WanVAEArchConfig(), load_encoder=False,
                                   param_dtype=jnp.bfloat16,
                                   rngs=nnx.Rngs(1))
            try:
                t0 = time.perf_counter()
                sync(vae.decode_dispatched(z, chunk_frames=chunk))
                cold = time.perf_counter() - t0
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    sync(vae.decode_dispatched(z, chunk_frames=chunk))
                    ts.append(time.perf_counter() - t0)
                print(f"mode={mode or 'xla':4s} chunk={chunk} "
                      f"resident={resident}: warm {min(ts):.2f}s "
                      f"(cold {cold:.1f}s)", flush=True)
            except Exception as e:
                print(f"mode={mode or 'xla':4s} chunk={chunk}: FAIL "
                      f"{type(e).__name__} {str(e)[:160]}", flush=True)
            del vae


main()
