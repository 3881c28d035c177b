"""LLaMA text encoder (HunyuanVideo's primary text encoder).

Behavioral reference: /root/reference/fastvideo/models/encoders/llama.py
(vLLM-style reimplementation of HF LlamaModel used encoder-only: causal
attention, RMSNorm pre-norm, SwiGLU MLP, neox-style rope). Checkpoints load
from the HF layout via LLAMA_PARAM_NAMES_MAPPING.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.configs.models.base import EncoderArchConfig, ModelConfig
from fastvideo_tpu.layers.linear import (ColumnParallelLinear,
                                         RowParallelLinear)
from fastvideo_tpu.layers.norm import RMSNorm
from fastvideo_tpu.models.encoders.t5 import BaseEncoderOutput, Embedding

Array = jax.Array

LLAMA_PARAM_NAMES_MAPPING: dict[str, str] = {
    r"^model\.embed_tokens\.(.*)$": r"embed_tokens.\1",
    r"^model\.layers\.(\d+)\.(.*)$": r"layers.\1.\2",
    r"^model\.norm\.(.*)$": r"norm.\1",
}


@dataclasses.dataclass
class LlamaArchConfig(EncoderArchConfig):
    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    max_position_embeddings: int = 8192
    text_len: int = 256
    # which hidden state to emit (-1 = final post-norm; HunyuanVideo uses
    # an intermediate layer via hidden_state_skip_layer)
    hidden_state_skip_layer: int = 2


@dataclasses.dataclass
class LlamaConfig(ModelConfig):
    arch_config: LlamaArchConfig = dataclasses.field(
        default_factory=LlamaArchConfig)
    param_names_mapping: dict[str, str] = dataclasses.field(
        default_factory=lambda: dict(LLAMA_PARAM_NAMES_MAPPING))


def _rope_tables(seq: int, dim: int, theta: float) -> tuple[Array, Array]:
    freqs = 1.0 / (theta**(np.arange(0, dim, 2, dtype=np.float64) / dim))
    angles = np.outer(np.arange(seq, dtype=np.float64), freqs)
    return (jnp.asarray(np.cos(angles), jnp.float32),
            jnp.asarray(np.sin(angles), jnp.float32))


def _apply_rope_neox(x: Array, cos: Array, sin: Array) -> Array:
    """Half-split (neox) rope: x [B, S, H, D]."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    cos = cos[None, :, None, :].astype(jnp.float32)
    sin = sin[None, :, None, :].astype(jnp.float32)
    x1f, x2f = x1.astype(jnp.float32), x2.astype(jnp.float32)
    o1 = x1f * cos - x2f * sin
    o2 = x2f * cos + x1f * sin
    return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)


class LlamaAttention(nnx.Module):
    def __init__(self, config: LlamaArchConfig, *, param_dtype, rngs):
        self.config = config
        h = config.hidden_size
        self.n_heads = config.num_attention_heads
        self.n_kv = config.num_key_value_heads
        self.head_dim = getattr(config, "head_dim", None) or h // self.n_heads
        # Qwen2-style models use biased q/k/v projections
        qkv_bias = bool(getattr(config, "attention_bias", False))
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.q_proj = ColumnParallelLinear(h, self.n_heads * self.head_dim,
                                           bias=qkv_bias, **kw)
        self.k_proj = ColumnParallelLinear(h, self.n_kv * self.head_dim,
                                           bias=qkv_bias, **kw)
        self.v_proj = ColumnParallelLinear(h, self.n_kv * self.head_dim,
                                           bias=qkv_bias, **kw)
        self.o_proj = RowParallelLinear(self.n_heads * self.head_dim, h,
                                        bias=False, **kw)
        # Qwen3-style per-head q/k RMSNorm
        if getattr(config, "qk_norm", False):
            self.q_norm = RMSNorm(self.head_dim, config.rms_norm_eps, **kw)
            self.k_norm = RMSNorm(self.head_dim, config.rms_norm_eps, **kw)
        else:
            self.q_norm = None
            self.k_norm = None

    def __call__(self, x: Array, cos: Array, sin: Array,
                 mask_bias: Array | None) -> Array:
        b, s, _ = x.shape
        q = self.q_proj(x).reshape(b, s, self.n_heads, self.head_dim)
        k = self.k_proj(x).reshape(b, s, self.n_kv, self.head_dim)
        v = self.v_proj(x).reshape(b, s, self.n_kv, self.head_dim)
        if self.q_norm is not None:
            q = self.q_norm(q).astype(x.dtype)
            k = self.k_norm(k).astype(x.dtype)
        q = _apply_rope_neox(q, cos, sin)
        k = _apply_rope_neox(k, cos, sin)
        if self.n_kv != self.n_heads:
            rep = self.n_heads // self.n_kv
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        out = jax.nn.dot_product_attention(q, k, v, bias=mask_bias,
                                           is_causal=mask_bias is None)
        return self.o_proj(out.reshape(b, s, -1))


class LlamaMLP(nnx.Module):
    def __init__(self, config: LlamaArchConfig, *, param_dtype, rngs):
        kw = dict(bias=False, param_dtype=param_dtype, rngs=rngs)
        self.gate_proj = ColumnParallelLinear(config.hidden_size,
                                              config.intermediate_size, **kw)
        self.up_proj = ColumnParallelLinear(config.hidden_size,
                                            config.intermediate_size, **kw)
        self.down_proj = RowParallelLinear(config.intermediate_size,
                                           config.hidden_size, **kw)

    def __call__(self, x: Array) -> Array:
        return self.down_proj(jax.nn.silu(self.gate_proj(x)) *
                              self.up_proj(x))


class LlamaDecoderLayer(nnx.Module):
    def __init__(self, config: LlamaArchConfig, *, param_dtype, rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.self_attn = LlamaAttention(config, **kw)
        self.mlp = LlamaMLP(config, **kw)
        self.input_layernorm = RMSNorm(config.hidden_size,
                                       config.rms_norm_eps, **kw)
        self.post_attention_layernorm = RMSNorm(config.hidden_size,
                                                config.rms_norm_eps, **kw)

    def __call__(self, x, cos, sin, mask_bias):
        x = x + self.self_attn(self.input_layernorm(x), cos, sin, mask_bias)
        return x + self.mlp(self.post_attention_layernorm(x))


class LlamaEncoderModel(nnx.Module):
    """LlamaModel used as a text encoder (causal masking preserved)."""

    def __init__(self, config: LlamaArchConfig, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.embed_tokens = Embedding(config.vocab_size, config.hidden_size,
                                      **kw)
        self.layers = nnx.List([
            LlamaDecoderLayer(config, **kw)
            for _ in range(config.num_hidden_layers)
        ])
        self.norm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)

    def __call__(self, input_ids: Array,
                 attention_mask: Array | None = None,
                 output_hidden_states: bool = False) -> BaseEncoderOutput:
        cfg = self.config
        x = self.embed_tokens(input_ids)
        s = x.shape[1]
        head_dim = (getattr(cfg, "head_dim", None)
                    or cfg.hidden_size // cfg.num_attention_heads)
        cos, sin = _rope_tables(s, head_dim, cfg.rope_theta)
        causal = jnp.tril(jnp.ones((s, s), bool))
        ok = causal[None, None]
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


EntryClass = LlamaEncoderModel
