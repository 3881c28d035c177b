"""Quantify the int8 in-block integration loss + the per-block glue cost.

Times a jitted scan of 30 REAL WanTransformerBlocks (production shape,
VSA 0.8) bf16 vs int8-quantized, and the same blocks with attention
replaced by identity (isolates linears+glue). Together with
exp_step_split.py's component numbers this pins down where the 1.36s step
goes and how much of the standalone int8 win (ffn 318->239, qkvo 122->87)
survives integration.
"""
import os
import time

os.environ.setdefault("FASTVIDEO_ATTENTION_BACKEND", "VIDEO_SPARSE_ATTN")

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.utils import enable_compilation_cache

enable_compilation_cache()

S = 32760
DIM = 1536
LAYERS = 30


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
    from fastvideo_tpu.attention.backends.abstract import AttentionMetadata
    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.forward_context import set_forward_context
    from fastvideo_tpu.layers.quantization.int8 import (
        QuantizationConfig, quantize_model_linears)
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel

    key = jax.random.PRNGKey(0)
    cfg = WanArchConfig(num_attention_heads=12, attention_head_dim=128,
                        in_channels=16, out_channels=16, text_dim=4096,
                        freq_dim=256, ffn_dim=8960, num_layers=LAYERS)
    dit = WanTransformer3DModel(cfg, param_dtype=jnp.bfloat16,
                                rngs=nnx.Rngs(0))
    lat = jax.random.normal(key, (1, 16, 21, 60, 104), jnp.bfloat16)
    ctx = jax.random.normal(key, (1, 512, 4096), jnp.bfloat16)
    md_sparse = AttentionMetadata(extra={"VSA_sparsity": 0.8})

    def make_step(model, md):
        gd, st = nnx.split(model)

        @jax.jit
        def step(st, lat, ctx):
            m = nnx.merge(gd, st)
            t_arr = jnp.full((1,), 757.0, jnp.float32)
            with set_forward_context(attn_metadata=md):
                return m(lat, ctx, t_arr)

        return step, st

    step, st = make_step(dit, md_sparse)
    print(f"full step bf16: {timeit(step, st, lat, ctx):.0f} ms", flush=True)
    del step, st

    n = quantize_model_linears(dit, QuantizationConfig())
    print(f"quantized {n}", flush=True)
    step, st = make_step(dit, md_sparse)
    print(f"full step int8: {timeit(step, st, lat, ctx):.0f} ms", flush=True)
    del step, st

    # weight-only int8: same matmul dtype as bf16 (dequant at load of each
    # tile), isolates the dynamic-activation-quant overhead
    dit2 = WanTransformer3DModel(cfg, param_dtype=jnp.bfloat16,
                                 rngs=nnx.Rngs(0))
    quantize_model_linears(dit2,
                           QuantizationConfig(method="int8_weight_only"))
    step, st = make_step(dit2, md_sparse)
    print(f"full step int8-wo: {timeit(step, st, lat, ctx):.0f} ms",
          flush=True)


if __name__ == "__main__":
    main()
