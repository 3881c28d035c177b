"""In-model int8 loss localization: real WanTransformerBlock glue with
attention compute stubbed out (attn1 -> v, attn2 -> zeros).

If bf16-vs-int8 here recovers the standalone ~114 ms/step linear win, the
loss in the full model comes from interaction with the attention fusion
neighborhood; if the win stays ~30 ms, the glue (fp32 modulation/norm
chains around each linear) eats it and the fix is fusing quantization into
the producers.
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
    from fastvideo_tpu.layers.quantization.int8 import (
        QuantizationConfig, quantize_model_linears)
    from fastvideo_tpu.models.dits.wan import WanTransformerBlock

    class NoAttnBlock(WanTransformerBlock):
        def __call__(self, hidden_states, encoder_hidden_states, temb,
                     freqs_cis, kv_valid=None, grid=None, pre_tiled=False):
            orig_dtype = hidden_states.dtype
            b = hidden_states.shape[0]
            n, d = self.num_heads, self.dim // self.num_heads
            e = self.scale_shift_table.value + temb.astype(jnp.float32)
            mods = [e[:, i:i + 1] for i in range(6)]
            shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = mods

            norm_hidden = self.norm1._norm_f32(hidden_states)
            norm_hidden = (norm_hidden * (1.0 + scale_msa) +
                           shift_msa).astype(orig_dtype)
            q = self.norm_q(self.to_q(norm_hidden)).reshape(b, -1, n, d)
            k = self.norm_k(self.to_k(norm_hidden)).reshape(b, -1, n, d)
            v = self.to_v(norm_hidden).reshape(b, -1, n, d)
            attn_out = v + 0.0 * (q + k)  # stub: keep q/k live, no attention
            attn_out = self.to_out(attn_out.reshape(b, -1, self.dim))
            zero = jnp.zeros((), jnp.float32)
            norm_hidden, hidden_states = self.self_attn_residual_norm(
                hidden_states, attn_out, gate_msa, zero, zero)
            # cross-attn stubbed: projections only via to_out-equivalent cost
            # intentionally omitted — we want linears WE quantize + glue
            one = jnp.ones((), jnp.float32)
            norm_hidden, hidden_states = self.cross_attn_residual_norm(
                hidden_states, jnp.zeros_like(norm_hidden), one, c_shift,
                c_scale)
            ff = self.ffn(norm_hidden)
            hidden_states = self.mlp_residual(hidden_states, ff, c_gate)
            return hidden_states.astype(orig_dtype)

    key = jax.random.PRNGKey(0)
    blk = NoAttnBlock(DIM, 8960, 12, param_dtype=jnp.bfloat16,
                      rngs=nnx.Rngs(0))
    x = jax.random.normal(key, (1, S, DIM), jnp.bfloat16) * 0.02
    ctx = jax.random.normal(key, (1, 512, DIM), jnp.bfloat16)
    temb = jax.random.normal(key, (1, 6, DIM), jnp.float32) * 0.02
    fc = (jnp.ones((S, 64), jnp.float32), jnp.zeros((S, 64), jnp.float32))

    def make(blk):
        gd, st = nnx.split(blk)

        @jax.jit
        def run(st, x):
            m = nnx.merge(gd, st)

            def body(c, _):
                return m(c, ctx, temb, fc), None

            out, _ = jax.lax.scan(body, x, None, length=LAYERS)
            return out

        return run, st

    run, st = make(blk)
    print(f"noattn block bf16 x{LAYERS}: {timeit(run, st, x):.0f} ms",
          flush=True)
    quantize_model_linears(blk, QuantizationConfig())
    run, st = make(blk)
    print(f"noattn block int8 x{LAYERS}: {timeit(run, st, x):.0f} ms",
          flush=True)


if __name__ == "__main__":
    main()
