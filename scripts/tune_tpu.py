"""TPU microbenchmarks: attention block sizes, VSA speedup, VAE chunking.

Run on the real chip: python scripts/tune_tpu.py [attn|vsa|vae]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, n=3, **kwargs):
    out = fn(*args, **kwargs)
    _sync(out)
    t0 = time.perf_counter()
    outs = [fn(*args, **kwargs) for _ in range(n)]
    _sync(sum(jnp.sum(o.astype(jnp.float32)) for o in outs))
    return (time.perf_counter() - t0) / n


def bench_attn() -> None:
    from fastvideo_tpu.ops.flash_attention import flash_attention

    B, S, H, D = 1, 32760, 12, 128
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    flops = 4 * B * H * S * S * D
    for bq, bkv in [(128, 128), (256, 256), (256, 512), (512, 512),
                    (512, 1024), (1024, 1024), (256, 1024), (128, 512)]:
        try:
            fn = lambda: flash_attention(q, k, v, block_q=bq, block_kv=bkv)
            t = timeit(lambda *_: fn(), n=3)
            print(f"flash bq={bq} bkv={bkv}: {t*1000:.0f}ms "
                  f"({flops/t/1e12:.0f} TF/s)")
        except Exception as e:
            print(f"flash bq={bq} bkv={bkv}: FAIL {type(e).__name__} {e}")

    # XLA baseline
    try:
        fn = jax.jit(lambda q, k, v: jax.nn.dot_product_attention(q, k, v))
        t = timeit(fn, q, k, v, n=3)
        print(f"xla sdpa: {t*1000:.0f}ms ({flops/t/1e12:.0f} TF/s)")
    except Exception as e:
        print(f"xla sdpa FAIL: {e}")


def bench_vsa() -> None:
    from fastvideo_tpu.ops.vsa import tile_layout, video_sparse_attn

    # post-patchify token grid for 480x832x81f with patch (1,2,2)
    dit_shape = (21, 30, 52)
    B, H, D = 1, 12, 128
    key = jax.random.PRNGKey(0)
    for tile in ((4, 8, 8),):
        elems = tile[0] * tile[1] * tile[2]
        _, _, sizes, ntiles, padded = tile_layout(dit_shape, tile)
        print(f"tile={tile} tiles={ntiles} padded_len={padded}")
        q = jax.random.normal(key, (B, H, padded, D), jnp.bfloat16)
        k = jax.random.normal(key, (B, H, padded, D), jnp.bfloat16)
        v = jax.random.normal(key, (B, H, padded, D), jnp.bfloat16)
        sizes_j = jnp.asarray(sizes)
        nb = padded // elems
        for sparsity in (0.875, 0.9375):
            topk = max(1, int(np.ceil((1 - sparsity) * nb)))
            f = jax.jit(lambda q, k, v, topk=topk, e=elems:
                        video_sparse_attn(q, k, v, sizes_j, topk,
                                          tile_elems=e))
            t = timeit(f, q, k, v, n=3)
            print(f"vsa tile={tile} sparsity={sparsity} "
                  f"topk={topk}/{nb}: {t*1000:.0f}ms")


def bench_vae() -> None:
    from flax import nnx

    from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig
    from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan

    vae = AutoencoderKLWan(WanVAEArchConfig(), load_encoder=False,
                           param_dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(vae)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 21, 60, 104),
                          jnp.bfloat16)
    for chunk in (1, 2, 4, 5, 10):
        f = jax.jit(lambda state, z, c=chunk: nnx.merge(graphdef, state)
                    .decode(z, chunk_frames=c))
        try:
            t = timeit(f, state, z, n=2)
            print(f"vae decode chunk={chunk}: {t*1000:.0f}ms")
        except Exception as e:
            print(f"vae decode chunk={chunk}: FAIL {type(e).__name__}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "attn"
    {"attn": bench_attn, "vsa": bench_vsa, "vae": bench_vae}[which]()
