"""Gemma text encoder.

Behavioral reference: /root/reference/fastvideo/models/encoders/gemma.py
and HF GemmaModel: sqrt(hidden)-scaled embeddings, RMSNorm with
``(1 + weight)`` scaling, GeGLU (tanh-gelu) MLP, explicit head_dim,
neox-style rope. Used by LTX-2's T5Gemma text stack.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.base import EncoderArchConfig, ModelConfig
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.models.encoders.llama import (_apply_rope_neox,
                                                 _rope_tables)
from fastvideo_tpu.models.encoders.t5 import BaseEncoderOutput, Embedding

Array = jax.Array

GEMMA_PARAM_NAMES_MAPPING: dict[str, str] = {
    r"^model\.(.*)$": r"\1",
}


@dataclasses.dataclass
class GemmaArchConfig(EncoderArchConfig):
    vocab_size: int = 256000
    hidden_size: int = 3072
    intermediate_size: int = 24576
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    head_dim: int = 256
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    max_position_embeddings: int = 8192
    text_len: int = 256


@dataclasses.dataclass
class GemmaConfig(ModelConfig):
    arch_config: GemmaArchConfig = dataclasses.field(
        default_factory=GemmaArchConfig)
    param_names_mapping: dict[str, str] = dataclasses.field(
        default_factory=lambda: dict(GEMMA_PARAM_NAMES_MAPPING))


class GemmaRMSNorm(nnx.Module):
    """x_norm * (1 + weight), fp32 stats (HF Gemma convention)."""

    def __init__(self, dim: int, eps: float = 1e-6, *, param_dtype,
                 rngs: nnx.Rngs):
        del rngs
        self.eps = eps
        self.weight = nnx.Param(jnp.zeros((dim,), param_dtype))

    def __call__(self, x: Array) -> Array:
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (xf * (1.0 + self.weight.value.astype(jnp.float32))).astype(
            x.dtype)


class GemmaAttention(nnx.Module):
    def __init__(self, config: GemmaArchConfig, *, param_dtype, rngs):
        h = config.hidden_size
        self.n_heads = config.num_attention_heads
        self.n_kv = config.num_key_value_heads
        self.head_dim = config.head_dim
        kw = dict(bias=False, param_dtype=param_dtype, rngs=rngs)
        self.q_proj = Linear(h, self.n_heads * self.head_dim, **kw)
        self.k_proj = Linear(h, self.n_kv * self.head_dim, **kw)
        self.v_proj = Linear(h, self.n_kv * self.head_dim, **kw)
        self.o_proj = Linear(self.n_heads * self.head_dim, h, **kw)

    def __call__(self, x: Array, cos: Array, sin: Array,
                 mask_bias: Array | None) -> Array:
        b, s, _ = x.shape
        q = self.q_proj(x).reshape(b, s, self.n_heads, self.head_dim)
        k = self.k_proj(x).reshape(b, s, self.n_kv, self.head_dim)
        v = self.v_proj(x).reshape(b, s, self.n_kv, self.head_dim)
        q = _apply_rope_neox(q, cos, sin)
        k = _apply_rope_neox(k, cos, sin)
        if self.n_kv != self.n_heads:
            rep = self.n_heads // self.n_kv
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        out = jax.nn.dot_product_attention(q, k, v, bias=mask_bias,
                                           is_causal=mask_bias is None)
        return self.o_proj(out.reshape(b, s, -1))


class GemmaMLP(nnx.Module):
    def __init__(self, config: GemmaArchConfig, *, param_dtype, rngs):
        kw = dict(bias=False, param_dtype=param_dtype, rngs=rngs)
        self.gate_proj = Linear(config.hidden_size,
                                config.intermediate_size, **kw)
        self.up_proj = Linear(config.hidden_size, config.intermediate_size,
                              **kw)
        self.down_proj = Linear(config.intermediate_size,
                                config.hidden_size, **kw)

    def __call__(self, x: Array) -> Array:
        return self.down_proj(
            jax.nn.gelu(self.gate_proj(x), approximate=True) *
            self.up_proj(x))


class GemmaDecoderLayer(nnx.Module):
    def __init__(self, config: GemmaArchConfig, *, param_dtype, rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.self_attn = GemmaAttention(config, **kw)
        self.mlp = GemmaMLP(config, **kw)
        self.input_layernorm = GemmaRMSNorm(config.hidden_size,
                                            config.rms_norm_eps, **kw)
        self.post_attention_layernorm = GemmaRMSNorm(config.hidden_size,
                                                     config.rms_norm_eps,
                                                     **kw)

    def __call__(self, x, cos, sin, mask_bias):
        x = x + self.self_attn(self.input_layernorm(x), cos, sin, mask_bias)
        return x + self.mlp(self.post_attention_layernorm(x))


class GemmaEncoderModel(nnx.Module):
    """GemmaModel used as a text encoder (causal masking preserved)."""

    def __init__(self, config: GemmaArchConfig, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.embed_tokens = Embedding(config.vocab_size, config.hidden_size,
                                      **kw)
        self.layers = nnx.List([
            GemmaDecoderLayer(config, **kw)
            for _ in range(config.num_hidden_layers)
        ])
        self.norm = GemmaRMSNorm(config.hidden_size, config.rms_norm_eps,
                                 **kw)

    def __call__(self, input_ids: Array,
                 attention_mask: Array | None = None,
                 output_hidden_states: bool = False) -> BaseEncoderOutput:
        cfg = self.config
        x = self.embed_tokens(input_ids)
        # HF Gemma scales embeddings by sqrt(hidden_size) in the embed dtype
        normalizer = jnp.asarray(cfg.hidden_size**0.5, x.dtype)
        x = x * normalizer
        s = x.shape[1]
        cos, sin = _rope_tables(s, cfg.head_dim, cfg.rope_theta)
        ok = jnp.tril(jnp.ones((s, s), bool))[None, None]
        if attention_mask is not None:
            ok = ok & (attention_mask[:, None, None, :] > 0)
        bias = jnp.where(ok, 0.0, jnp.finfo(jnp.float32).min)
        hidden_states = [x] if output_hidden_states else None
        for layer in self.layers:
            x = layer(x, cos, sin, bias)
            if output_hidden_states:
                hidden_states.append(x)
        final = self.norm(x)
        if output_hidden_states:
            hidden_states.append(final)
        return BaseEncoderOutput(
            last_hidden_state=final, attention_mask=attention_mask,
            hidden_states=tuple(hidden_states)
            if output_hidden_states else None)


EntryClass = GemmaEncoderModel
