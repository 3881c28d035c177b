"""Production-config decode timing: bf16 vs int8 (W8A8) kf convs.

Runs decode_dispatched exactly as DecodingStage does (auto chunking,
denormalize, bf16 decode dtype) next to a resident 1.3B-DiT-sized ballast,
first with the default conv policy then with FASTVIDEO_VAE_CONV3D=auto_int8.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig
from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan
from fastvideo_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    modes = sys.argv[1:] or ["auto", "auto_int8"]
    vae = AutoencoderKLWan(WanVAEArchConfig(), load_encoder=False,
                           param_dtype=jnp.bfloat16, rngs=nnx.Rngs(1))
    ballast = jax.device_put(jnp.zeros((1_300_000_000,), jnp.bfloat16))
    sync(ballast[:1])
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 21, 60, 104),
                          jnp.float32)
    for mode in modes:
        os.environ["FASTVIDEO_VAE_CONV3D"] = mode
        # decode_dispatched caches its jitted chunk fns on the module; the
        # conv mode is baked in at trace time, so a mode switch must drop
        # the cache or it silently re-times the previous mode's executable
        if hasattr(vae, "_disp"):
            del vae._disp
        t0 = time.perf_counter()
        sync(vae.decode_dispatched(z, denormalize=True,
                                   decode_dtype=jnp.bfloat16))
        print(f"[{mode}] compile+first: {time.perf_counter() - t0:.1f}s",
              flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(vae.decode_dispatched(z, denormalize=True,
                                       decode_dtype=jnp.bfloat16))
            ts.append(time.perf_counter() - t0)
        print(f"[{mode}] decode warm: {min(ts):.2f}s (all "
              f"{[round(t, 2) for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
