"""Bisect the 1.3B VSA denoise step: where does the time go, and why does
int8 W8A8 barely move it?

Times, at production shape (1x16x21x60x104 latents -> 32760 tokens), a
jitted scan of 30 repetitions of each component in isolation:
  - ffn only (1536->8960->1536), bf16 vs int8
  - qkv+out projections only, bf16 vs int8
  - VSA self-attention only (0.8 sparsity, incl. composition)
  - cross-attention only (512 ctx tokens)
plus the full real step for reference. Sync is a host fetch (axon
block_until_ready is a no-op).
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
FFN = 8960
HEADS = 12
HDIM = 128
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


def scan_over(module_fn, params, x, extra=None):
    """jit(scan of LAYERS applications of module_fn)."""

    @jax.jit
    def run(params, x, extra):
        def body(c, _):
            y = module_fn(params, c, extra)
            return y, None

        out, _ = jax.lax.scan(body, x, None, length=LAYERS)
        return out

    return lambda: run(params, x, extra)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, S, DIM), jnp.bfloat16) * 0.02
    ctx = jax.random.normal(key, (1, 512, DIM), jnp.bfloat16)

    from fastvideo_tpu.layers.linear import Linear
    from fastvideo_tpu.layers.mlp import MLP
    from fastvideo_tpu.layers.quantization.int8 import (QuantizationConfig,
                                                        quantize_model_linears)

    # --- ffn ---------------------------------------------------------------
    mlp = MLP(DIM, FFN, act_type="gelu_pytorch_tanh",
              param_dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
    gd, st = nnx.split(mlp)
    fn = scan_over(lambda p, c, _: (nnx.merge(gd, p)(c)).astype(c.dtype),
                   st, x)
    print(f"ffn bf16 x{LAYERS}: {timeit(lambda: fn()):.0f} ms", flush=True)
    quantize_model_linears(mlp, QuantizationConfig())
    gd, st = nnx.split(mlp)
    fn = scan_over(lambda p, c, _: (nnx.merge(gd, p)(c)).astype(c.dtype),
                   st, x)
    print(f"ffn int8 x{LAYERS}: {timeit(lambda: fn()):.0f} ms", flush=True)

    # --- qkv + out ----------------------------------------------------------
    class QKVO(nnx.Module):
        def __init__(self, rngs):
            self.to_q = Linear(DIM, DIM, param_dtype=jnp.bfloat16, rngs=rngs)
            self.to_k = Linear(DIM, DIM, param_dtype=jnp.bfloat16, rngs=rngs)
            self.to_v = Linear(DIM, DIM, param_dtype=jnp.bfloat16, rngs=rngs)
            self.to_out = Linear(DIM, DIM, param_dtype=jnp.bfloat16,
                                 rngs=rngs)

        def __call__(self, c):
            q = self.to_q(c)
            k = self.to_k(c)
            v = self.to_v(c)
            return self.to_out(q * 0.5 + k * 0.25 + v * 0.25)

    qkvo = QKVO(nnx.Rngs(0))
    gd, st = nnx.split(qkvo)
    fn = scan_over(lambda p, c, _: nnx.merge(gd, p)(c).astype(c.dtype),
                   st, x)
    print(f"qkvo bf16 x{LAYERS}: {timeit(lambda: fn()):.0f} ms", flush=True)
    quantize_model_linears(qkvo, QuantizationConfig())
    gd, st = nnx.split(qkvo)
    fn = scan_over(lambda p, c, _: nnx.merge(gd, p)(c).astype(c.dtype),
                   st, x)
    print(f"qkvo int8 x{LAYERS}: {timeit(lambda: fn()):.0f} ms", flush=True)

    # --- VSA self-attention (0.8 sparsity incl composition) -----------------
    from fastvideo_tpu.ops.vsa import select_vsa_tile, video_sparse_attn
    GRID = (21, 30, 52)
    tile = select_vsa_tile(GRID)
    elems = tile[0] * tile[1] * tile[2]
    nb = S // elems
    topk = max(1, int(np.ceil(0.2 * nb)))
    sizes = jnp.full((nb,), elems, jnp.int32)
    q = jax.random.normal(key, (1, HEADS, S, HDIM), jnp.bfloat16)

    @jax.jit
    def vsa_run(q):
        def body(c, _):
            o = video_sparse_attn(c, c, c, sizes, topk, tile_elems=elems,
                                  full_tiles=True, q_group=3)
            return o.astype(c.dtype), None

        out, _ = jax.lax.scan(body, q, None, length=LAYERS)
        return out

    print(f"vsa x{LAYERS}: {timeit(lambda: vsa_run(q)):.0f} ms", flush=True)

    # --- cross-attention ----------------------------------------------------
    from fastvideo_tpu.models.dits.wan import WanT2VCrossAttention
    xattn = WanT2VCrossAttention(DIM, HEADS, param_dtype=jnp.bfloat16,
                                 rngs=nnx.Rngs(0))
    gd, st = nnx.split(xattn)
    fn = scan_over(lambda p, c, e: nnx.merge(gd, p)(c, e).astype(c.dtype),
                   st, x, ctx)
    print(f"xattn bf16 x{LAYERS}: {timeit(lambda: fn()):.0f} ms", flush=True)


if __name__ == "__main__":
    main()
