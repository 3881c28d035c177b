"""Localize the int8 integration loss inside the REAL full step.

Components in isolation win (ffn 318->239 ms, qkvo 122->87 per 30 layers)
and the attention-stubbed real block recovers the win (436->331), yet the
full step only moves 1360->1329. This quantizes SUBSETS of the real model's
linears to find which neighborhood forfeits the win:
  - all (reference point)
  - ffn only        (exclude every to_* attention projection)
  - attn only       (exclude the ffn)
  - all minus gate  (exclude to_gate_compress, the VSA gate feed)
"""
import os
import time

os.environ.setdefault("FASTVIDEO_ATTENTION_BACKEND", "VIDEO_SPARSE_ATTN")

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.attention.backends.abstract import AttentionMetadata
from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
from fastvideo_tpu.forward_context import set_forward_context
from fastvideo_tpu.layers.quantization.int8 import (QuantizationConfig,
                                                    quantize_model_linears)
from fastvideo_tpu.models.dits.wan import WanTransformer3DModel
from fastvideo_tpu.utils import enable_compilation_cache

enable_compilation_cache()


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


BASE_EXCL = ("embedder", "norm", "proj_out")
VARIANTS = [
    ("all", BASE_EXCL),
    ("ffn-only", BASE_EXCL + ("to",)),          # "to" word-matches to_q/k/v/out/gate_compress
    ("attn-only", BASE_EXCL + ("ffn", "fc")),
    ("no-gate", BASE_EXCL + ("compress",)),
]


def main():
    key = jax.random.PRNGKey(0)
    cfg = WanArchConfig(num_attention_heads=12, attention_head_dim=128,
                        in_channels=16, out_channels=16, text_dim=4096,
                        freq_dim=256, ffn_dim=8960, num_layers=30)
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

    dit = WanTransformer3DModel(cfg, param_dtype=jnp.bfloat16,
                                rngs=nnx.Rngs(0))
    step, st = make_step(dit)
    print(f"bf16: {timeit(step, st, lat, ctx):.0f} ms", flush=True)
    del dit, step, st

    for name, excl in VARIANTS:
        dit = WanTransformer3DModel(cfg, param_dtype=jnp.bfloat16,
                                    rngs=nnx.Rngs(0))
        n = quantize_model_linears(dit, QuantizationConfig(exclude=excl))
        step, st = make_step(dit)
        print(f"int8 {name} ({n} linears): "
              f"{timeit(step, st, lat, ctx):.0f} ms", flush=True)
        del dit, step, st


if __name__ == "__main__":
    main()
