"""SigLIP vision encoder.

Behavioral reference: /root/reference/fastvideo/models/encoders/siglip.py
and HF SiglipVisionModel: conv patch embedding + learned position
embedding (no CLS token), pre-LN transformer with tanh-gelu MLPs, post
layernorm, and a multihead-attention pooling head (learned probe query).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.base import EncoderArchConfig, ModelConfig
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.models.encoders.t5 import BaseEncoderOutput, Embedding

Array = jax.Array

SIGLIP_PARAM_NAMES_MAPPING: dict[str, str] = {
    r"^vision_model\.encoder\.layers\.(.*)$": r"vision_model.layers.\1",
    r"^vision_model\.head\.attention\.in_proj_(weight|bias)$":
    r"vision_model.head.attention.in_proj.\1",
    r"^vision_model\.head\.attention\.out_proj\.(.*)$":
    r"vision_model.head.attention.out_proj.\1",
    r"^vision_model\.(.*)$": r"vision_model.\1",
}


@dataclasses.dataclass
class SiglipVisionArchConfig(EncoderArchConfig):
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    image_size: int = 384
    patch_size: int = 14
    num_channels: int = 3
    layer_norm_eps: float = 1e-6


@dataclasses.dataclass
class SiglipVisionConfig(ModelConfig):
    arch_config: SiglipVisionArchConfig = dataclasses.field(
        default_factory=SiglipVisionArchConfig)
    param_names_mapping: dict[str, str] = dataclasses.field(
        default_factory=lambda: dict(SIGLIP_PARAM_NAMES_MAPPING))


class _LayerNorm(nnx.Module):
    def __init__(self, dim: int, eps: float, *, param_dtype, rngs):
        del rngs
        self.eps = eps
        self.weight = nnx.Param(jnp.ones((dim,), param_dtype))
        self.bias = nnx.Param(jnp.zeros((dim,), param_dtype))

    def __call__(self, x: Array) -> Array:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (out * self.weight.value.astype(jnp.float32) +
                self.bias.value.astype(jnp.float32)).astype(x.dtype)


class SiglipAttention(nnx.Module):
    def __init__(self, cfg: SiglipVisionArchConfig, *, param_dtype, rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        d = cfg.hidden_size
        self.num_heads = cfg.num_attention_heads
        self.head_dim = d // self.num_heads
        self.q_proj = Linear(d, d, **kw)
        self.k_proj = Linear(d, d, **kw)
        self.v_proj = Linear(d, d, **kw)
        self.out_proj = Linear(d, d, **kw)

    def __call__(self, x: Array) -> Array:
        b, s, _ = x.shape
        q = self.q_proj(x).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(x).reshape(b, s, self.num_heads, self.head_dim)
        v = self.v_proj(x).reshape(b, s, self.num_heads, self.head_dim)
        out = jax.nn.dot_product_attention(q, k, v)
        return self.out_proj(out.reshape(b, s, -1))


class SiglipMLP(nnx.Module):
    def __init__(self, cfg: SiglipVisionArchConfig, *, param_dtype, rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.fc1 = Linear(cfg.hidden_size, cfg.intermediate_size, **kw)
        self.fc2 = Linear(cfg.intermediate_size, cfg.hidden_size, **kw)

    def __call__(self, x: Array) -> Array:
        return self.fc2(jax.nn.gelu(self.fc1(x), approximate=True))


class SiglipEncoderLayer(nnx.Module):
    def __init__(self, cfg: SiglipVisionArchConfig, *, param_dtype, rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.layer_norm1 = _LayerNorm(cfg.hidden_size, cfg.layer_norm_eps,
                                      **kw)
        self.self_attn = SiglipAttention(cfg, **kw)
        self.layer_norm2 = _LayerNorm(cfg.hidden_size, cfg.layer_norm_eps,
                                      **kw)
        self.mlp = SiglipMLP(cfg, **kw)

    def __call__(self, x: Array) -> Array:
        x = x + self.self_attn(self.layer_norm1(x))
        return x + self.mlp(self.layer_norm2(x))


class SiglipEmbeddings(nnx.Module):
    """Conv patchify (as matmul) + learned position embedding."""

    def __init__(self, cfg: SiglipVisionArchConfig, *, param_dtype, rngs):
        p = cfg.patch_size
        self.patch_size = p
        n_pos = (cfg.image_size // p)**2
        self.patch_embedding = Linear(cfg.num_channels * p * p,
                                      cfg.hidden_size,
                                      param_dtype=param_dtype, rngs=rngs)
        self.position_embedding = Embedding(n_pos, cfg.hidden_size,
                                            param_dtype=param_dtype,
                                            rngs=rngs)

    def __call__(self, pixel_values: Array) -> Array:
        b, c, h, w = pixel_values.shape
        p = self.patch_size
        x = pixel_values.reshape(b, c, h // p, p, w // p, p)
        # conv weight layout (C, ph, pw) feature order
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(
            b, (h // p) * (w // p), c * p * p)
        x = self.patch_embedding(x)
        return x + self.position_embedding.weight.value[None].astype(x.dtype)


class SiglipPoolingHead(nnx.Module):
    """MultiheadAttention pooling with a learned probe (HF
    SiglipMultiheadAttentionPoolingHead)."""

    def __init__(self, cfg: SiglipVisionArchConfig, *, param_dtype, rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        d = cfg.hidden_size
        self.num_heads = cfg.num_attention_heads
        self.head_dim = d // self.num_heads
        init = nnx.initializers.normal(0.02)
        self.probe = nnx.Param(init(rngs.params(), (1, 1, d), param_dtype))

        class _MHA(nnx.Module):
            def __init__(self):
                self.in_proj = Linear(d, 3 * d, **kw)
                self.out_proj = Linear(d, d, **kw)

        self.attention = _MHA()
        self.layernorm = _LayerNorm(d, cfg.layer_norm_eps, **kw)
        self.mlp = SiglipMLP(cfg, **kw)

    def __call__(self, x: Array) -> Array:
        b, s, d = x.shape
        kernel = self.attention.in_proj.kernel.value.astype(x.dtype)
        bias = self.attention.in_proj.bias.value.astype(x.dtype)
        probe = jnp.broadcast_to(self.probe.value.astype(x.dtype),
                                 (b, 1, d))
        q = probe @ kernel[:, :d] + bias[:d]
        k = x @ kernel[:, d:2 * d] + bias[d:2 * d]
        v = x @ kernel[:, 2 * d:] + bias[2 * d:]
        q = q.reshape(b, 1, self.num_heads, self.head_dim)
        k = k.reshape(b, s, self.num_heads, self.head_dim)
        v = v.reshape(b, s, self.num_heads, self.head_dim)
        out = jax.nn.dot_product_attention(q, k, v).reshape(b, 1, d)
        out = self.attention.out_proj(out)
        residual = out
        out = residual + self.mlp(self.layernorm(out))
        return out[:, 0]


class _SiglipVisionTransformer(nnx.Module):
    def __init__(self, cfg: SiglipVisionArchConfig, *, param_dtype, rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.embeddings = SiglipEmbeddings(cfg, **kw)
        self.layers = nnx.List([
            SiglipEncoderLayer(cfg, **kw)
            for _ in range(cfg.num_hidden_layers)
        ])
        self.post_layernorm = _LayerNorm(cfg.hidden_size,
                                         cfg.layer_norm_eps, **kw)
        self.head = SiglipPoolingHead(cfg, **kw)


class SiglipVisionModel(nnx.Module):
    def __init__(self, config: SiglipVisionArchConfig, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.vision_model = _SiglipVisionTransformer(
            config, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, pixel_values: Array, **kwargs) -> BaseEncoderOutput:
        vm = self.vision_model
        x = vm.embeddings(pixel_values)
        for layer in vm.layers:
            x = layer(x)
        x = vm.post_layernorm(x)
        out = BaseEncoderOutput(last_hidden_state=x)
        out.pooler_output = vm.head(x)
        return out


EntryClass = SiglipVisionModel
