"""VAE decode timing: isolated vs DiT-resident, chunk sweep, scan vs
dispatched."""
import sys
import time

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig
from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, n=3, **kw):
    sync(fn(*args, **kw))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args, **kw))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    resident = "resident" in sys.argv
    vae = AutoencoderKLWan(WanVAEArchConfig(), load_encoder=False,
                           param_dtype=jnp.bfloat16, rngs=nnx.Rngs(1))
    ballast = None
    if resident:
        # simulate the resident 1.3B DiT (2.6 GB bf16)
        ballast = jax.device_put(
            jnp.zeros((1_300_000_000,), jnp.bfloat16))
        sync(ballast[:1])
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 21, 60, 104),
                          jnp.bfloat16)
    for chunk in (None, 2, 3, 4, 6):
        try:
            t = timeit(vae.decode_dispatched, z, chunk_frames=chunk)
            print(f"decode_dispatched chunk={chunk} resident={resident}: "
                  f"{t:.2f} s", flush=True)
        except Exception as e:
            print(f"chunk={chunk}: FAIL {type(e).__name__} {str(e)[:120]}",
                  flush=True)
    if not resident:
        dec = jax.jit(lambda zz: vae.decode(zz, chunk_frames=4))
        try:
            t = timeit(dec, z)
            print(f"fused scan decode chunk=4 isolated: {t:.2f} s",
                  flush=True)
        except Exception as e:
            print(f"fused scan: FAIL {type(e).__name__} {str(e)[:120]}",
                  flush=True)


main()
