"""Op-level profile of the production VAE decode (chunked, Pallas kf conv).

Captures one warm decode_dispatched() of a 5s 480p clip and prints the
top ops via exp_parse_trace — splits the ~3.5 s DecodingStage into conv
kernel time vs the non-conv tail (norms/upsample/glue) the round-4
verdict flagged as ~1.1 s.
"""
import os
import time

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig
from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan
from fastvideo_tpu.utils import enable_compilation_cache

enable_compilation_cache()

VAE_CFG = dict(base_dim=96, z_dim=16, dim_mult=(1, 2, 4, 4),
               num_res_blocks=2, attn_scales=(),
               temperal_downsample=(False, True, True),
               latents_mean=tuple([0.0] * 16),
               latents_std=tuple([1.0] * 16),
               scale_factor_temporal=4, scale_factor_spatial=8)


def main():
    vae = AutoencoderKLWan(WanVAEArchConfig(**VAE_CFG), load_encoder=False,
                           param_dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (1, 16, 21, 60, 104), jnp.bfloat16)

    def run():
        out = vae.decode_dispatched(z)
        return float(jnp.sum(out.astype(jnp.float32)))

    run()  # compile
    t0 = time.perf_counter()
    run()
    print(f"decode warm: {time.perf_counter() - t0:.2f} s", flush=True)

    logdir = "/tmp/prof_decode"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        run()
    print("traced; parse with: python scripts/exp_parse_trace.py "
          f"{logdir} 50", flush=True)


if __name__ == "__main__":
    main()
