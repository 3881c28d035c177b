"""Benchmark: 5s 480p Wan2.1-1.3B-class clip, end-to-end on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (north star, BASELINE.json): 81 frames @ 480x832 (5s @ 16fps),
FastWan 3-step DMD sampling (no CFG), full bf16 Wan2.1-1.3B architecture
(30 layers, dim 1536, heads 12) with random weights + Wan2.1 VAE decoder.
Latent grid 21x60x104 -> 32760 DiT tokens. vs_baseline is the driver
target (5 s on v6e-8) divided by our measured E2E; >1 beats target.
"""

from __future__ import annotations

import json
import sys
import time


def build_models(dtype):
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel
    from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan

    dit_cfg = WanArchConfig(num_attention_heads=12, attention_head_dim=128,
                            in_channels=16, out_channels=16, text_dim=4096,
                            freq_dim=256, ffn_dim=8960, num_layers=30)
    dit = WanTransformer3DModel(dit_cfg, param_dtype=dtype, rngs=nnx.Rngs(0))
    vae_cfg = WanVAEArchConfig()
    vae = AutoencoderKLWan(vae_cfg, load_encoder=False,
                          param_dtype=jnp.bfloat16, rngs=nnx.Rngs(1))
    return dit, vae


def main() -> None:
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    num_frames, height, width = 81, 480, 832
    dmd_steps = [1000.0, 757.0, 522.0]
    text_len, text_dim = 512, 4096

    dtype = jnp.bfloat16
    dit, vae = build_models(dtype)
    dit_def, dit_state = nnx.split(dit)
    vae_def, vae_state = nnx.split(vae)

    lat_t = (num_frames - 1) // 4 + 1
    lat_h, lat_w = height // 8, width // 8

    @jax.jit
    def dit_step(state, latents, ctx, t):
        m = nnx.merge(dit_def, state)
        return m(latents, ctx, t)

    @jax.jit
    def vae_decode(state, z):
        m = nnx.merge(vae_def, state)
        return m.decode(z)

    key = jax.random.PRNGKey(0)
    latents = jax.random.normal(key, (1, 16, lat_t, lat_h, lat_w),
                                jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, text_len, text_dim),
                            dtype)

    def _sync(x) -> float:
        # NOTE: on this platform block_until_ready() is async-no-op; the only
        # true sync is a host fetch, so we reduce to a scalar and pull it.
        return float(jnp.sum(x.astype(jnp.float32)))

    def run_e2e():
        lat = latents
        sigmas = [t / 1000.0 for t in dmd_steps] + [0.0]
        for i, t in enumerate(dmd_steps):
            t_arr = jnp.full((1,), t, jnp.float32)
            pred = dit_step(dit_state, lat.astype(dtype), ctx, t_arr)
            sigma, nsig = sigmas[i], sigmas[i + 1]
            x0 = lat - sigma * pred.astype(jnp.float32)
            lat = x0 if nsig == 0 else (1 - nsig) * x0 + nsig * latents
        return vae_decode(vae_state, lat.astype(jnp.bfloat16))

    # warmup / compile (+ first execution)
    t0 = time.perf_counter()
    _sync(run_e2e())
    compile_time = time.perf_counter() - t0
    print(f"# compile+first-run: {compile_time:.1f}s", file=sys.stderr)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(run_e2e())
        times.append(time.perf_counter() - t0)
    e2e = min(times)
    print(f"# e2e times: {[round(t, 3) for t in times]}", file=sys.stderr)

    # component timing (amortize sync latency over N iters)
    t_arr = jnp.full((1,), 1000.0, jnp.float32)
    x = latents.astype(dtype)
    _sync(dit_step(dit_state, x, ctx, t_arr))
    n = 3
    t0 = time.perf_counter()
    outs = [dit_step(dit_state, x, ctx, t_arr) for _ in range(n)]
    _sync(sum(jnp.sum(o.astype(jnp.float32)) for o in outs))
    dit_ms = (time.perf_counter() - t0) * 1000 / n
    z = latents.astype(jnp.bfloat16)
    _sync(vae_decode(vae_state, z))
    t0 = time.perf_counter()
    _sync(vae_decode(vae_state, z))
    vae_ms = (time.perf_counter() - t0) * 1000
    print(f"# dit step: {dit_ms:.0f}ms, vae decode: {vae_ms:.0f}ms",
          file=sys.stderr)

    baseline = 5.0  # seconds, v6e-8 target from BASELINE.json
    print(json.dumps({
        "metric": "wan2.1-1.3b 5s 480p clip E2E (3-step DMD, 1 chip)",
        "value": round(e2e, 3),
        "unit": "s",
        "vs_baseline": round(baseline / e2e, 3),
    }))


if __name__ == "__main__":
    main()
