"""Where do the TextEncoding seconds go? trace vs compile vs execute,
for the bench checkpoint's UMT5 at several depths."""
import sys
import time

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.encoders.t5 import T5ArchConfig
from fastvideo_tpu.models.encoders.t5 import T5EncoderModel
from fastvideo_tpu.utils import enable_compilation_cache

if "cache" in sys.argv:
    enable_compilation_cache()
print(f"devices: {jax.devices()}", flush=True)

for layers in (1, 4):
    cfg = T5ArchConfig(vocab_size=8192, d_model=4096, d_kv=64, d_ff=10240,
                       num_layers=layers, num_heads=64,
                       relative_attention_num_buckets=32,
                       relative_attention_max_distance=128,
                       feed_forward_proj="gated-gelu", is_umt5=True)
    t0 = time.perf_counter()
    enc = T5EncoderModel(cfg, param_dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(enc)
    print(f"L={layers} init {time.perf_counter()-t0:.1f}s", flush=True)

    def fn(state, ids, mask):
        return nnx.merge(graphdef, state)(ids, mask)

    ids = jnp.zeros((1, 512), jnp.int32)
    mask = jnp.ones((1, 512), jnp.int32)
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(state, ids, mask)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    out = compiled(state, ids, mask)
    float(jnp.sum(out.last_hidden_state[:, :1, :1].astype(jnp.float32)))
    t3 = time.perf_counter()
    out = compiled(state, ids, mask)
    float(jnp.sum(out.last_hidden_state[:, :1, :1].astype(jnp.float32)))
    t4 = time.perf_counter()
    print(f"L={layers} trace {t1-t0:.1f}s compile {t2-t1:.1f}s "
          f"first-exec {t3-t2:.1f}s warm {t4-t3:.3f}s", flush=True)
