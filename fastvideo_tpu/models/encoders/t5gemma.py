"""T5-Gemma encoder (the MagiHuman text conditioner), TPU-native.

Behavioral reference: /root/reference/fastvideo/models/encoders/t5gemma.py
(a lazy wrapper around transformers' T5GemmaEncoderModel) + HF
modeling_t5gemma: a Gemma-2-style stack — scaled embeddings, pre/post
self-attention AND pre/post feed-forward RMSNorms, GQA with
``query_pre_attn_scalar`` scaling and attention-logit softcapping,
alternating bidirectional sliding-window / full attention — run as a
BIDIRECTIONAL text encoder.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.configs.models.base import ArchConfig, ModelConfig
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.models.encoders.t5 import BaseEncoderOutput, Embedding

Array = jax.Array

T5GEMMA_PARAM_NAMES_MAPPING: dict[str, str] = {
    r"^encoder\.(.*)$": r"\1",
    r"^model\.encoder\.(.*)$": r"\1",
}


@dataclasses.dataclass
class T5GemmaArchConfig(ArchConfig):
    vocab_size: int = 256000
    hidden_size: int = 3584
    intermediate_size: int = 28672
    num_hidden_layers: int = 42
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 256
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    query_pre_attn_scalar: float = 256.0
    attn_logit_softcapping: float | None = 50.0
    sliding_window: int = 4096
    layer_types: tuple[str, ...] = ()
    text_len: int = 640

    def resolved_layer_types(self) -> tuple[str, ...]:
        if self.layer_types:
            return tuple(self.layer_types)
        return tuple("sliding_attention" if i % 2 == 0 else "full_attention"
                     for i in range(self.num_hidden_layers))


class T5GemmaRMSNorm(nnx.Module):
    """x_norm * (1 + w), fp32 stats (Gemma convention)."""

    def __init__(self, dim: int, eps: float = 1e-6, *, param_dtype,
                 rngs: nnx.Rngs):
        del rngs
        self.eps = eps
        self.weight = nnx.Param(jnp.zeros((dim,), param_dtype))

    def __call__(self, x: Array) -> Array:
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (xf *
                (1.0 + self.weight.value.astype(jnp.float32))).astype(
                    x.dtype)


def _rope_neox(x: Array, cos: Array, sin: Array) -> Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[None, :, None] + rotated * sin[None, :, None]


class T5GemmaSelfAttention(nnx.Module):
    def __init__(self, cfg: T5GemmaArchConfig, layer_idx: int, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(bias=False, param_dtype=param_dtype, rngs=rngs)
        self.n_heads = cfg.num_attention_heads
        self.n_kv = cfg.num_key_value_heads
        self.head_dim = cfg.head_dim
        self.scaling = cfg.query_pre_attn_scalar ** -0.5
        self.softcap = cfg.attn_logit_softcapping
        self.sliding_window = (
            cfg.sliding_window
            if cfg.resolved_layer_types()[layer_idx] == "sliding_attention"
            else None)
        h = cfg.hidden_size
        self.q_proj = Linear(h, self.n_heads * self.head_dim, **kw)
        self.k_proj = Linear(h, self.n_kv * self.head_dim, **kw)
        self.v_proj = Linear(h, self.n_kv * self.head_dim, **kw)
        self.o_proj = Linear(self.n_heads * self.head_dim, h, **kw)

    def __call__(self, x: Array, cos: Array, sin: Array,
                 key_mask: Array | None) -> Array:
        b, s, _ = x.shape
        q = self.q_proj(x).reshape(b, s, self.n_heads, self.head_dim)
        k = self.k_proj(x).reshape(b, s, self.n_kv, self.head_dim)
        v = self.v_proj(x).reshape(b, s, self.n_kv, self.head_dim)
        q = _rope_neox(q, cos, sin)
        k = _rope_neox(k, cos, sin)
        if self.n_kv != self.n_heads:
            rep = self.n_heads // self.n_kv
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * self.scaling
        if self.softcap is not None:
            scores = jnp.tanh(scores / self.softcap) * self.softcap
        neg = jnp.finfo(jnp.float32).min
        mask = jnp.ones((s, s), bool)
        if self.sliding_window is not None:
            idx = jnp.arange(s)
            dist = jnp.abs(idx[:, None] - idx[None, :])
            mask = dist < self.sliding_window
        bias = jnp.where(mask[None, None], 0.0, neg)
        if key_mask is not None:
            bias = bias + jnp.where(key_mask[:, None, None, :].astype(bool),
                                    0.0, neg)
        attn = jax.nn.softmax(scores.astype(jnp.float32) + bias,
                              axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, s, -1)
        return self.o_proj(out)


class T5GemmaMLP(nnx.Module):
    def __init__(self, cfg: T5GemmaArchConfig, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(bias=False, param_dtype=param_dtype, rngs=rngs)
        self.gate_proj = Linear(cfg.hidden_size, cfg.intermediate_size,
                                **kw)
        self.up_proj = Linear(cfg.hidden_size, cfg.intermediate_size, **kw)
        self.down_proj = Linear(cfg.intermediate_size, cfg.hidden_size,
                                **kw)

    def __call__(self, x: Array) -> Array:
        return self.down_proj(
            jax.nn.gelu(self.gate_proj(x), approximate=True) *
            self.up_proj(x))


class T5GemmaEncoderLayer(nnx.Module):
    def __init__(self, cfg: T5GemmaArchConfig, layer_idx: int, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.self_attn = T5GemmaSelfAttention(cfg, layer_idx, **kw)
        self.pre_self_attn_layernorm = T5GemmaRMSNorm(cfg.hidden_size,
                                                      cfg.rms_norm_eps,
                                                      **kw)
        self.post_self_attn_layernorm = T5GemmaRMSNorm(cfg.hidden_size,
                                                       cfg.rms_norm_eps,
                                                       **kw)
        self.mlp = T5GemmaMLP(cfg, **kw)
        self.pre_feedforward_layernorm = T5GemmaRMSNorm(cfg.hidden_size,
                                                        cfg.rms_norm_eps,
                                                        **kw)
        self.post_feedforward_layernorm = T5GemmaRMSNorm(cfg.hidden_size,
                                                         cfg.rms_norm_eps,
                                                         **kw)

    def __call__(self, x, cos, sin, key_mask):
        h = self.pre_self_attn_layernorm(x)
        h = self.self_attn(h, cos, sin, key_mask)
        x = x + self.post_self_attn_layernorm(h)
        h = self.pre_feedforward_layernorm(x)
        h = self.mlp(h)
        return x + self.post_feedforward_layernorm(h)


class T5GemmaEncoderModel(nnx.Module):
    """Bidirectional Gemma-2 text encoder (HF T5GemmaEncoderModel)."""

    def __init__(self, config: T5GemmaArchConfig, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.config = config
        self.embed_tokens = Embedding(config.vocab_size,
                                      config.hidden_size, **kw)
        self.layers = nnx.List([
            T5GemmaEncoderLayer(config, i, **kw)
            for i in range(config.num_hidden_layers)
        ])
        self.norm = T5GemmaRMSNorm(config.hidden_size, config.rms_norm_eps,
                                   **kw)

    def __call__(self, input_ids: Array,
                 attention_mask: Array | None = None,
                 output_hidden_states: bool = False) -> BaseEncoderOutput:
        cfg = self.config
        x = self.embed_tokens(input_ids)
        x = x * jnp.asarray(math.sqrt(cfg.hidden_size), x.dtype)
        s = x.shape[1]
        inv_freq = 1.0 / cfg.rope_theta ** (
            np.arange(0, cfg.head_dim, 2, dtype=np.float32) / cfg.head_dim)
        pos = np.arange(s, dtype=np.float32)
        freqs = np.outer(pos, inv_freq)
        emb = np.concatenate([freqs, freqs], axis=-1)
        cos = jnp.asarray(np.cos(emb), x.dtype)
        sin = jnp.asarray(np.sin(emb), x.dtype)

        hidden = [x] if output_hidden_states else None
        for layer in self.layers:
            x = layer(x, cos, sin, attention_mask)
            if hidden is not None:
                hidden.append(x)
        x = self.norm(x)
        if hidden is not None:
            hidden.append(x)
        return BaseEncoderOutput(
            last_hidden_state=x, attention_mask=attention_mask,
            hidden_states=tuple(hidden) if hidden is not None else None)


@dataclasses.dataclass
class T5GemmaConfig(ModelConfig):
    arch_config: T5GemmaArchConfig = dataclasses.field(
        default_factory=T5GemmaArchConfig)
    param_names_mapping: dict[str, str] = dataclasses.field(
        default_factory=lambda: dict(T5GEMMA_PARAM_NAMES_MAPPING))


EntryClass = T5GemmaEncoderModel
