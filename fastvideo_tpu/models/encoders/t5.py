"""T5 / UMT5 text encoder, TPU-native.

Behavioral reference: /root/reference/fastvideo/models/encoders/t5.py (which
reimplements HF (U)MT5 with TP linears). Checkpoints load from the HF layout
via T5_PARAM_NAMES_MAPPING. T5 specifics preserved: RMS "layer norm"
(no mean subtraction, no bias), attention WITHOUT 1/sqrt(d) scaling, binned
relative position bias (per-layer for UMT5, layer-0-shared for T5), gated
act FF. fp32 norms; matmuls run in the configured compute dtype.

TP: q/k/v/wi are column-parallel and o/wo row-parallel over the ``tp`` mesh
axis (sharding rules applied by the loader), mirroring the reference's
QKVParallelLinear/RowParallelLinear split.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.configs.models.encoders.t5 import T5ArchConfig
from fastvideo_tpu.layers.activation import get_act_fn
from fastvideo_tpu.layers.linear import (ColumnParallelLinear,
                                         RowParallelLinear)
from fastvideo_tpu.layers.norm import RMSNorm

Array = jax.Array


@dataclasses.dataclass
class BaseEncoderOutput:
    last_hidden_state: Array
    attention_mask: Array | None = None
    hidden_states: tuple[Array, ...] | None = None
    pooler_output: Array | None = None
    # dual-stream text conditioning (LTX-2 Gemma connector's audio branch)
    audio_hidden_state: Array | None = None


# registered as a pytree so jitted encoder programs can return it whole
jax.tree_util.register_dataclass(
    BaseEncoderOutput,
    data_fields=["last_hidden_state", "attention_mask", "hidden_states",
                 "pooler_output", "audio_hidden_state"],
    meta_fields=[])


from fastvideo_tpu.layers.embeddings import Embedding  # noqa: E402,F401


def relative_position_bucket(relative_position: np.ndarray,
                             bidirectional: bool = True,
                             num_buckets: int = 32,
                             max_distance: int = 128) -> np.ndarray:
    """Mesh-TF bucketing (reference t5.py:283-345), host-side numpy."""
    relative_buckets = np.zeros_like(relative_position)
    if bidirectional:
        num_buckets //= 2
        relative_buckets += (relative_position > 0).astype(np.int64) * \
            num_buckets
        relative_position = np.abs(relative_position)
    else:
        relative_position = -np.minimum(relative_position, 0)
    max_exact = num_buckets // 2
    is_small = relative_position < max_exact
    rp_large = max_exact + (
        np.log(np.maximum(relative_position, 1) / max_exact) /
        math.log(max_distance / max_exact) *
        (num_buckets - max_exact)).astype(np.int64)
    rp_large = np.minimum(rp_large, num_buckets - 1)
    return relative_buckets + np.where(is_small, relative_position, rp_large)


class T5SelfAttention(nnx.Module):
    def __init__(self, config: T5ArchConfig, has_relative_attention_bias:
                 bool, *, param_dtype: jnp.dtype, rngs: nnx.Rngs):
        self.config = config
        self.n_heads = config.num_heads
        self.d_kv = config.d_kv
        inner = config.num_heads * config.d_kv
        kw = dict(bias=False, param_dtype=param_dtype, rngs=rngs)
        self.q = ColumnParallelLinear(config.d_model, inner, **kw)
        self.k = ColumnParallelLinear(config.d_model, inner, **kw)
        self.v = ColumnParallelLinear(config.d_model, inner, **kw)
        self.o = RowParallelLinear(inner, config.d_model, **kw)
        self.relative_attention_bias = (Embedding(
            config.relative_attention_num_buckets, config.num_heads,
            param_dtype=param_dtype, rngs=rngs)
            if has_relative_attention_bias else None)

    def compute_bias(self, q_len: int, k_len: int) -> Array:
        """[1, H, Q, K] additive bias."""
        ctx = np.arange(q_len)[:, None]
        mem = np.arange(k_len)[None, :]
        buckets = relative_position_bucket(
            mem - ctx, bidirectional=True,
            num_buckets=self.config.relative_attention_num_buckets,
            max_distance=self.config.relative_attention_max_distance)
        table = self.relative_attention_bias(jnp.asarray(buckets))
        return table.transpose(2, 0, 1)[None]  # [1, H, Q, K]

    def __call__(self, x: Array, position_bias: Array | None,
                 mask_bias: Array | None) -> tuple[Array, Array | None]:
        b, s, _ = x.shape
        q = self.q(x).reshape(b, s, self.n_heads, self.d_kv)
        k = self.k(x).reshape(b, s, self.n_heads, self.d_kv)
        v = self.v(x).reshape(b, s, self.n_heads, self.d_kv)
        if position_bias is None and self.relative_attention_bias is not None:
            position_bias = self.compute_bias(s, s)
        bias = position_bias
        if bias is None:
            bias = jnp.zeros((1, self.n_heads, s, s), jnp.float32)
        if mask_bias is not None:
            bias = bias + mask_bias
        # T5: no 1/sqrt(d) scale.
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores + bias.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = out.reshape(b, s, -1)
        return self.o(out), position_bias


class T5FF(nnx.Module):
    def __init__(self, config: T5ArchConfig, *, param_dtype: jnp.dtype,
                 rngs: nnx.Rngs):
        kw = dict(bias=False, param_dtype=param_dtype, rngs=rngs)
        self.gated = config.is_gated_act
        if self.gated:
            self.wi_0 = ColumnParallelLinear(config.d_model, config.d_ff,
                                             **kw)
            self.wi_1 = ColumnParallelLinear(config.d_model, config.d_ff,
                                             **kw)
        else:
            self.wi = ColumnParallelLinear(config.d_model, config.d_ff, **kw)
        self.wo = RowParallelLinear(config.d_ff, config.d_model, **kw)
        self.act = get_act_fn(config.dense_act_fn)

    def __call__(self, x: Array) -> Array:
        if self.gated:
            h = self.act(self.wi_0(x)) * self.wi_1(x)
        else:
            h = self.act(self.wi(x))
        return self.wo(h)


class T5Block(nnx.Module):
    def __init__(self, config: T5ArchConfig,
                 has_relative_attention_bias: bool, *,
                 param_dtype: jnp.dtype, rngs: nnx.Rngs):
        self.self_attn = T5SelfAttention(config, has_relative_attention_bias,
                                         param_dtype=param_dtype, rngs=rngs)
        self.self_attn_layer_norm = RMSNorm(config.d_model,
                                            config.layer_norm_epsilon,
                                            param_dtype=param_dtype,
                                            rngs=rngs)
        self.ff = T5FF(config, param_dtype=param_dtype, rngs=rngs)
        self.ff_layer_norm = RMSNorm(config.d_model,
                                     config.layer_norm_epsilon,
                                     param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: Array, position_bias: Array | None,
                 mask_bias: Array | None) -> tuple[Array, Array | None]:
        attn_out, position_bias = self.self_attn(
            self.self_attn_layer_norm(x), position_bias, mask_bias)
        x = x + attn_out
        x = x + self.ff(self.ff_layer_norm(x))
        return x, position_bias


class T5EncoderModel(nnx.Module):
    """Encoder-only (U)MT5 (reference t5.py:542+)."""

    def __init__(self, config: T5ArchConfig, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.shared = Embedding(config.vocab_size, config.d_model,
                                param_dtype=param_dtype, rngs=rngs)
        self.blocks = nnx.List([
            T5Block(config,
                    has_relative_attention_bias=(config.is_umt5 or i == 0),
                    param_dtype=param_dtype, rngs=rngs)
            for i in range(config.num_layers)
        ])
        self.final_layer_norm = RMSNorm(config.d_model,
                                        config.layer_norm_epsilon,
                                        param_dtype=param_dtype, rngs=rngs)
        # lax.scan over stacked block params (UMT5 only: every layer owns
        # its own relative-attention bias, so blocks are structurally
        # uniform). One compiled block instead of num_layers inlined
        # copies — the same treatment as the Wan DiT (models/dits/wan.py).
        # Default: scan only DEEP encoders (the real UMT5-XXL is 24
        # layers, where unrolled compile scales with depth). Measured on
        # the axon rig (round 4): a scanned executable is NOT served from
        # the persistent compile cache (~120 s first-exec EVERY process)
        # while the unrolled 4-layer program warm-starts in 2.1 s — so
        # shallow encoders stay unrolled. FASTVIDEO_T5_SCAN=0/1 forces.
        import os

        env = os.getenv("FASTVIDEO_T5_SCAN")
        self.scan_layers = (env == "1" if env in ("0", "1")
                            else config.num_layers >= 8)

    def _scan_blocks(self, x: Array, mask_bias: Array | None) -> Array:
        graphdef, _ = nnx.split(self.blocks[0])
        states = [nnx.split(blk)[1] for blk in self.blocks]
        stacked = jax.tree.map(lambda *leaves: jnp.stack(leaves), *states)

        def body(carry, layer_state):
            blk = nnx.merge(graphdef, layer_state)
            out, _ = blk(carry, None, mask_bias)
            return out, None

        x, _ = jax.lax.scan(body, x, stacked)
        return x

    def __call__(self, input_ids: Array,
                 attention_mask: Array | None = None) -> BaseEncoderOutput:
        x = self.shared(input_ids)
        mask_bias = None
        if attention_mask is not None:
            mask_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0,
                                  jnp.finfo(jnp.float32).min)
        if (self.scan_layers and self.config.is_umt5
                and len(self.blocks) > 1):
            x = self._scan_blocks(x, mask_bias)
        else:
            position_bias = None
            for block in self.blocks:
                x, pb = block(x, position_bias, mask_bias)
                if not self.config.is_umt5:
                    position_bias = pb  # T5 shares layer-0 bias downstream
        x = self.final_layer_norm(x)
        return BaseEncoderOutput(last_hidden_state=x,
                                 attention_mask=attention_mask)


EntryClass = T5EncoderModel
