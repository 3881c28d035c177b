"""Cosmos (NVIDIA Cosmos-Predict2) video DiT, TPU-native.

Behavioral reference: /root/reference/fastvideo/models/dits/cosmos.py
(:18-743): condition-mask + padding-mask input channels, half-split
(neox) 3D RoPE with NTK-scaled per-axis thetas and fps-scaled temporal
positions, normalized learnable positional embedding, AdaLN-LoRA blocks
(self-attn -> cross-attn -> gelu MLP, all bias-free), EDM-preconditioned
output head.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.attention import DistributedAttention, LocalAttention
from fastvideo_tpu.configs.models.base import DiTArchConfig, ModelConfig
from fastvideo_tpu.layers.embeddings import timestep_embedding
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.mlp import MLP
from fastvideo_tpu.layers.norm import RMSNorm
from fastvideo_tpu.models.dits.sd3 import _ln

Array = jax.Array

COSMOS_PARAM_NAMES_MAPPING: dict[str, str] = {
    r"^(.*)\.to_out\.0\.(weight|bias)$": r"\1.to_out.\2",
    r"^(.*)\.ff\.net\.0\.proj\.(.*)$": r"\1.ff.fc_in.\2",
    r"^(.*)\.ff\.net\.2\.(.*)$": r"\1.ff.fc_out.\2",
}


@dataclasses.dataclass
class CosmosArchConfig(DiTArchConfig):
    # in_channels includes the condition_mask channel (16 latent + 1 cond)
    in_channels: int = 17
    out_channels: int = 16
    num_attention_heads: int = 16
    attention_head_dim: int = 128
    num_layers: int = 28
    mlp_ratio: float = 4.0
    text_embed_dim: int = 1024
    adaln_lora_dim: int = 256
    max_size: tuple[int, int, int] = (128, 240, 240)
    patch_size: tuple[int, int, int] = (1, 2, 2)
    rope_scale: tuple[float, float, float] = (1.0, 3.0, 3.0)
    concat_padding_mask: bool = True
    extra_pos_embed_type: str | None = None
    qk_norm: str = "rms_norm"

    @property
    def hidden_size(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def num_channels_latents(self) -> int:
        return self.in_channels - 1


@dataclasses.dataclass
class CosmosVideoConfig(ModelConfig):
    arch_config: CosmosArchConfig = dataclasses.field(
        default_factory=CosmosArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(COSMOS_PARAM_NAMES_MAPPING))


def _apply_rope_halfsplit(x: Array, cos: Array, sin: Array) -> Array:
    """Half-split rotation (diffusers use_real_unbind_dim=-2);
    x [B, S, H, D], cos/sin [S, D]."""
    xf = x.astype(jnp.float32)
    d2 = xf.shape[-1] // 2
    x1, x2 = xf[..., :d2], xf[..., d2:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (xf * cos[None, :, None, :] +
            rot * sin[None, :, None, :]).astype(x.dtype)


@functools.lru_cache(maxsize=8)
def cosmos_rope(head_dim: int, sizes: tuple[int, int, int],
                rope_scale: tuple[float, float, float],
                fps: float | None = 16.0, base_fps: float = 24.0):
    """Per-axis tables (t, h, w), cat([t,h,w]*2) (reference :403-483)."""
    dim_h = head_dim // 6 * 2
    dim_w = dim_h
    dim_t = head_dim - dim_h - dim_w
    h_theta = 10000.0 * rope_scale[1]**(dim_h / (dim_h - 2))
    w_theta = 10000.0 * rope_scale[2]**(dim_w / (dim_w - 2))
    t_theta = 10000.0 * rope_scale[0]**(dim_t / (dim_t - 2))
    t_sz, h_sz, w_sz = sizes

    def freqs(dim, theta):
        r = np.arange(0, dim, 2, dtype=np.float32)[:dim // 2] / dim
        return 1.0 / theta**r

    emb_h = np.outer(np.arange(h_sz, dtype=np.float32), freqs(dim_h, h_theta))
    emb_w = np.outer(np.arange(w_sz, dtype=np.float32), freqs(dim_w, w_theta))
    t_pos = np.arange(t_sz, dtype=np.float32)
    if fps is not None:
        t_pos = t_pos / fps * base_fps
    emb_t = np.outer(t_pos, freqs(dim_t, t_theta))
    # broadcast to the (t, h, w) grid, token order t-major
    et = np.broadcast_to(emb_t[:, None, None, :],
                         (t_sz, h_sz, w_sz, emb_t.shape[-1]))
    eh = np.broadcast_to(emb_h[None, :, None, :],
                         (t_sz, h_sz, w_sz, emb_h.shape[-1]))
    ew = np.broadcast_to(emb_w[None, None, :, :],
                         (t_sz, h_sz, w_sz, emb_w.shape[-1]))
    f = np.concatenate([et, eh, ew], axis=-1).reshape(t_sz * h_sz * w_sz, -1)
    f = np.concatenate([f, f], axis=-1)
    return jnp.asarray(np.cos(f)), jnp.asarray(np.sin(f))


class CosmosPatchEmbed(nnx.Module):
    """Patchify keeping the torch feature order (C, pt, ph, pw); bias-free."""

    def __init__(self, in_channels: int, out_channels: int,
                 patch_size: tuple[int, int, int], *, param_dtype,
                 rngs: nnx.Rngs):
        self.patch_size = tuple(patch_size)
        in_features = in_channels * math.prod(self.patch_size)
        self.proj = Linear(in_features, out_channels, bias=False,
                           param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        b, c, t, h, w = x.shape
        pt, ph, pw = self.patch_size
        x = x.reshape(b, c, t // pt, pt, h // ph, ph, w // pw, pw)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        x = x.reshape(b, (t // pt) * (h // ph) * (w // pw), -1)
        return self.proj(x)


class CosmosTimestepEmbedding(nnx.Module):
    def __init__(self, in_features: int, out_features: int, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(bias=False, param_dtype=param_dtype, rngs=rngs)
        self.linear_1 = Linear(in_features, out_features, **kw)
        self.linear_2 = Linear(out_features, 3 * out_features, **kw)

    def __call__(self, t_emb: Array) -> Array:
        return self.linear_2(jax.nn.silu(self.linear_1(t_emb)))


class CosmosEmbedding(nnx.Module):
    def __init__(self, embedding_dim: int, condition_dim: int, *,
                 param_dtype, rngs: nnx.Rngs):
        self.embedding_dim = embedding_dim
        self.t_embedder = CosmosTimestepEmbedding(embedding_dim,
                                                  condition_dim,
                                                  param_dtype=param_dtype,
                                                  rngs=rngs)
        self.norm = RMSNorm(embedding_dim, eps=1e-6,
                            param_dtype=param_dtype, rngs=rngs)

    def __call__(self, timestep: Array, dtype) -> tuple[Array, Array]:
        proj = timestep_embedding(timestep, self.embedding_dim).astype(dtype)
        temb = self.t_embedder(proj)
        embedded = self.norm(proj).astype(dtype)
        return temb, embedded


class CosmosAdaLayerNorm(nnx.Module):
    """Final AdaLN (2 mods; temb adds its first 2*dim slice)."""

    def __init__(self, in_features: int, hidden_features: int, *,
                 param_dtype, rngs: nnx.Rngs):
        self.dim = in_features
        kw = dict(bias=False, param_dtype=param_dtype, rngs=rngs)
        self.linear_1 = Linear(in_features, hidden_features, **kw)
        self.linear_2 = Linear(hidden_features, 2 * in_features, **kw)

    def __call__(self, x: Array, embedded_timestep: Array,
                 temb: Array | None = None) -> Array:
        e = self.linear_2(self.linear_1(jax.nn.silu(embedded_timestep)))
        if temb is not None:
            e = e + temb[..., :2 * self.dim]
        shift, scale = jnp.split(e.astype(jnp.float32), 2, axis=-1)
        normed = _ln(x)
        if e.ndim == 2:
            shift, scale = shift[:, None], scale[:, None]
        return (normed * (1 + scale) + shift).astype(x.dtype)


class CosmosAdaLayerNormZero(nnx.Module):
    def __init__(self, in_features: int, hidden_features: int, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(bias=False, param_dtype=param_dtype, rngs=rngs)
        self.linear_1 = Linear(in_features, hidden_features, **kw)
        self.linear_2 = Linear(hidden_features, 3 * in_features, **kw)

    def __call__(self, x: Array, embedded_timestep: Array,
                 temb: Array | None = None):
        e = self.linear_2(self.linear_1(jax.nn.silu(embedded_timestep)))
        if temb is not None:
            e = e + temb
        shift, scale, gate = jnp.split(e.astype(jnp.float32), 3, axis=-1)
        normed = _ln(x)
        if e.ndim == 2:
            shift, scale, gate = shift[:, None], scale[:, None], gate[:, None]
        out = (normed * (1 + scale) + shift).astype(x.dtype)
        return out, gate.astype(x.dtype)


class CosmosAttention(nnx.Module):
    """Self (rope) or cross (text) attention; bias-free, qk rms norm."""

    def __init__(self, dim: int, num_heads: int,
                 cross_attention_dim: int | None = None,
                 eps: float = 1e-5, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.heads = num_heads
        self.head_dim = dim // num_heads
        kv_dim = cross_attention_dim or dim
        self.to_q = Linear(dim, dim, bias=False, **kw)
        self.to_k = Linear(kv_dim, dim, bias=False, **kw)
        self.to_v = Linear(kv_dim, dim, bias=False, **kw)
        self.to_out = Linear(dim, dim, bias=False, **kw)
        self.norm_q = RMSNorm(self.head_dim, eps=eps, **kw)
        self.norm_k = RMSNorm(self.head_dim, eps=eps, **kw)
        self.is_cross = cross_attention_dim is not None
        self.attn = (LocalAttention(num_heads, self.head_dim)
                     if self.is_cross else
                     DistributedAttention(num_heads, self.head_dim))

    def _h(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.heads, self.head_dim)

    def __call__(self, x: Array, context: Array | None = None,
                 freqs_cis=None) -> Array:
        b, s, _ = x.shape
        kv_src = context if context is not None else x
        q = self.norm_q(self._h(self.to_q(x))).astype(x.dtype)
        k = self.norm_k(self._h(self.to_k(kv_src))).astype(x.dtype)
        v = self._h(self.to_v(kv_src))
        if freqs_cis is not None:
            cos, sin = freqs_cis
            q = _apply_rope_halfsplit(q, cos, sin)
            k = _apply_rope_halfsplit(k, cos, sin)
        out = self.attn(q, k, v)
        return self.to_out(out.reshape(b, s, -1))


class CosmosTransformerBlock(nnx.Module):
    def __init__(self, num_heads: int, head_dim: int,
                 cross_attention_dim: int, mlp_ratio: float,
                 adaln_lora_dim: int, *, param_dtype, rngs: nnx.Rngs):
        hidden = num_heads * head_dim
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm1 = CosmosAdaLayerNormZero(hidden, adaln_lora_dim, **kw)
        self.attn1 = CosmosAttention(hidden, num_heads, None, **kw)
        self.norm2 = CosmosAdaLayerNormZero(hidden, adaln_lora_dim, **kw)
        self.attn2 = CosmosAttention(hidden, num_heads, cross_attention_dim,
                                     **kw)
        self.norm3 = CosmosAdaLayerNormZero(hidden, adaln_lora_dim, **kw)
        self.ff = MLP(hidden, int(hidden * mlp_ratio), hidden, bias=False,
                      act_type="gelu", **kw)

    def __call__(self, x: Array, context: Array, embedded_timestep: Array,
                 temb: Array, freqs_cis, extra_pos_emb: Array | None):
        if extra_pos_emb is not None:
            x = x + extra_pos_emb
        h, gate = self.norm1(x, embedded_timestep, temb)
        x = x + gate * self.attn1(h, freqs_cis=freqs_cis)
        h, gate = self.norm2(x, embedded_timestep, temb)
        x = x + gate * self.attn2(h, context)
        h, gate = self.norm3(x, embedded_timestep, temb)
        return x + gate * self.ff(h)


class CosmosLearnablePositionalEmbed(nnx.Module):
    def __init__(self, hidden_size: int, max_size, patch_size, *,
                 param_dtype, rngs: nnx.Rngs):
        del rngs
        self.max_size = [s // p for s, p in zip(max_size, patch_size)]
        self.eps = 1e-6
        self.pos_emb_t = nnx.Param(
            jnp.zeros((self.max_size[0], hidden_size), param_dtype))
        self.pos_emb_h = nnx.Param(
            jnp.zeros((self.max_size[1], hidden_size), param_dtype))
        self.pos_emb_w = nnx.Param(
            jnp.zeros((self.max_size[2], hidden_size), param_dtype))

    def __call__(self, sizes: tuple[int, int, int], dtype) -> Array:
        t, h, w = sizes
        emb = (self.pos_emb_t.value[:t][:, None, None] +
               self.pos_emb_h.value[:h][None, :, None] +
               self.pos_emb_w.value[:w][None, None, :])
        emb = emb.reshape(1, t * h * w, -1)
        norm = jnp.linalg.norm(emb.astype(jnp.float32), axis=-1,
                               keepdims=True)
        # reference: eps + ||emb|| / sqrt(D)  (norm.numel()/emb.numel())
        denom = self.eps + norm / math.sqrt(emb.shape[-1])
        return (emb.astype(jnp.float32) / denom).astype(dtype)


class CosmosTransformer3DModel(nnx.Module):
    """Cosmos video DiT (reference cosmos.py:545-743)."""

    def __init__(self, config: CosmosArchConfig, *,
                 param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        inner = config.hidden_size
        in_ch = config.in_channels + (1 if config.concat_padding_mask else 0)
        self.patch_embed = CosmosPatchEmbed(in_ch, inner, config.patch_size,
                                            **kw)
        self.learnable_pos_embed = (
            CosmosLearnablePositionalEmbed(inner, config.max_size,
                                           config.patch_size, **kw)
            if config.extra_pos_embed_type == "learnable" else None)
        self.time_embed = CosmosEmbedding(inner, inner, **kw)
        self.transformer_blocks = nnx.List([
            CosmosTransformerBlock(config.num_attention_heads,
                                   config.attention_head_dim,
                                   config.text_embed_dim, config.mlp_ratio,
                                   config.adaln_lora_dim, **kw)
            for _ in range(config.num_layers)
        ])
        self.norm_out = CosmosAdaLayerNorm(inner, config.adaln_lora_dim,
                                           **kw)
        self.proj_out = Linear(inner,
                               config.out_channels *
                               math.prod(config.patch_size), bias=False,
                               **kw)

    def __call__(self, hidden_states: Array, encoder_hidden_states: Array,
                 timestep: Array, condition_mask: Array | None = None,
                 padding_mask: Array | None = None, fps: float | None = 16.0,
                 **kwargs) -> Array:
        cfg = self.config
        if condition_mask is not None:
            hidden_states = jnp.concatenate(
                [hidden_states, condition_mask.astype(hidden_states.dtype)],
                axis=1)
        b, c, t, h, w = hidden_states.shape
        if cfg.concat_padding_mask:
            if padding_mask is None:
                padding_mask = jnp.zeros((1, 1, h, w), hidden_states.dtype)
            pm = jnp.broadcast_to(padding_mask[:, :, None].astype(
                hidden_states.dtype), (b, 1, t, h, w))
            hidden_states = jnp.concatenate([hidden_states, pm], axis=1)

        pt, ph, pw = cfg.patch_size
        sizes = (t // pt, h // ph, w // pw)
        freqs_cis = cosmos_rope(cfg.attention_head_dim, sizes,
                                tuple(cfg.rope_scale), fps)
        x = self.patch_embed(hidden_states)
        extra = (self.learnable_pos_embed(sizes, x.dtype)
                 if self.learnable_pos_embed is not None else None)
        temb, embedded = self.time_embed(timestep.astype(jnp.float32),
                                         x.dtype)
        context = encoder_hidden_states.astype(x.dtype)
        for block in self.transformer_blocks:
            # the reference re-adds the positional embedding in EVERY block
            # (cosmos.py:377-379)
            x = block(x, context, embedded, temb, freqs_cis, extra)
        x = self.norm_out(x, embedded, temb)
        x = self.proj_out(x)
        # torch unpatchify: unflatten(2,(ph,pw,pt,C)); permute(0,7,1,6,2,4,3,5)
        tt, hh, ww = sizes
        x = x.reshape(b, tt, hh, ww, ph, pw, pt, cfg.out_channels)
        x = x.transpose(0, 7, 1, 6, 2, 4, 3, 5)
        return x.reshape(b, cfg.out_channels, tt * pt, hh * ph, ww * pw)


EntryClass = CosmosTransformer3DModel
