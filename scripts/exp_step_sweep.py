"""Full 1.3B step time under VSA geometry/qgroup variants + dense flash."""
import os
import sys
import time

cfg = sys.argv[1] if len(sys.argv) > 1 else "dense"
if cfg != "dense":
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "VIDEO_SPARSE_ATTN"
    tile, qg = cfg.split(":")
    if tile != "auto":
        os.environ["FASTVIDEO_VSA_TILE"] = tile
    os.environ["FASTVIDEO_VSA_QGROUP"] = qg
else:
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "FLASH_ATTN"

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.attention.backends.abstract import AttentionMetadata
from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
from fastvideo_tpu.forward_context import set_forward_context
from fastvideo_tpu.models.dits.wan import WanTransformer3DModel

dit_cfg = WanArchConfig(num_attention_heads=12, attention_head_dim=128,
                        in_channels=16, out_channels=16, text_dim=4096,
                        freq_dim=256, ffn_dim=8960, num_layers=30)
dit = WanTransformer3DModel(dit_cfg, param_dtype=jnp.bfloat16,
                            rngs=nnx.Rngs(0))
gd, st = nnx.split(dit)
key = jax.random.PRNGKey(0)
lat = jax.random.normal(key, (1, 16, 21, 60, 104), jnp.bfloat16)
ctx = jax.random.normal(key, (1, 512, 4096), jnp.bfloat16)
md = AttentionMetadata(extra={"VSA_sparsity": 0.8})


@jax.jit
def step(st, lat, ctx):
    m = nnx.merge(gd, st)
    t_arr = jnp.full((1,), 757.0, jnp.float32)
    with set_forward_context(attn_metadata=md):
        return m(lat, ctx, t_arr)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


sync(step(st, lat, ctx))
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    sync(step(st, lat, ctx))
    ts.append(time.perf_counter() - t0)
print(f"{cfg}: step {min(ts)*1000:.0f} ms", flush=True)
