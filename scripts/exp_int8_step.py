"""Full 1.3B VSA denoise-step: bf16 vs int8-quantized linears, on-chip.

Quantifies the FastWan-QAD-analog serving lever (the MXU runs int8 at 2x
bf16): step time with W8A8 linears vs the bf16 default, plus the production
q_group=3 sparse-attention composition for the step-time split.
"""
import os
import time

os.environ.setdefault("FASTVIDEO_ATTENTION_BACKEND", "VIDEO_SPARSE_ATTN")

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.attention.backends.abstract import AttentionMetadata
from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
from fastvideo_tpu.forward_context import set_forward_context
from fastvideo_tpu.models.dits.wan import WanTransformer3DModel


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, n=3):
    sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000


def main():
    from fastvideo_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    key = jax.random.PRNGKey(0)

    # production-shape sparse composition at the adaptive q_group
    from fastvideo_tpu.ops.vsa import select_vsa_tile, video_sparse_attn
    GRID = (21, 30, 52)
    S = GRID[0] * GRID[1] * GRID[2]
    tile = select_vsa_tile(GRID)
    elems = tile[0] * tile[1] * tile[2]
    nb = S // elems
    topk = max(1, int(np.ceil(0.2 * nb)))
    q = jax.random.normal(key, (1, 12, S, 128), jnp.bfloat16)
    k = jax.random.normal(key, (1, 12, S, 128), jnp.bfloat16)
    v = jax.random.normal(key, (1, 12, S, 128), jnp.bfloat16)
    sizes = jnp.full((nb,), elems, jnp.int32)
    for g in (1, 3):
        if nb % g:
            continue
        comp = jax.jit(lambda q_, k_, v_, g=g: video_sparse_attn(
            q_, k_, v_, sizes, topk, tile_elems=elems, full_tiles=True,
            q_group=g))
        print(f"composition q_group={g}: {timeit(comp, q, k, v):.1f} ms",
              flush=True)

    dit_cfg = WanArchConfig(num_attention_heads=12, attention_head_dim=128,
                            in_channels=16, out_channels=16, text_dim=4096,
                            freq_dim=256, ffn_dim=8960, num_layers=30)
    dit = WanTransformer3DModel(dit_cfg, param_dtype=jnp.bfloat16,
                                rngs=nnx.Rngs(0))
    lat = jax.random.normal(key, (1, 16, 21, 60, 104), jnp.bfloat16)
    ctx = jax.random.normal(key, (1, 512, 4096), jnp.bfloat16)
    md = AttentionMetadata(extra={"VSA_sparsity": 0.8})

    def make_step(model):
        gd, st = nnx.split(model)

        @jax.jit
        def step(st, lat, ctx):
            m = nnx.merge(gd, st)
            t_arr = jnp.full((1,), 757.0, jnp.float32)
            with set_forward_context(attn_metadata=md):
                return m(lat, ctx, t_arr)

        return step, st

    step, st = make_step(dit)
    print(f"bf16 step: {timeit(step, st, lat, ctx):.0f} ms", flush=True)
    del step, st

    from fastvideo_tpu.layers.quantization import (QuantizationConfig,
                                                   quantize_model_linears)
    n = quantize_model_linears(dit, QuantizationConfig())
    print(f"quantized {n} linears", flush=True)
    step_q, st_q = make_step(dit)
    print(f"int8 step: {timeit(step_q, st_q, lat, ctx):.0f} ms", flush=True)


if __name__ == "__main__":
    main()
