"""GLM-Image DiT (joint text+image MM-DiT with shared projections).

Behavioral reference: /root/reference/fastvideo/models/dits/glm_image.py
(:69-776): text and image tokens are CONCATENATED and run through ONE
set of qkv/out projections and ONE feed-forward (unlike SD3's per-stream
weights); a 12-chunk AdaLN modulates both streams separately; RoPE is
half-split (neox) 2-axis (h|w) applied only to the image tokens; the
image stream adds a VQ prior-token embedding; timestep conditioning adds
SDXL-style sincos target-size + crop-coordinate embeddings. A per-layer
KV cache supports condition write / read / skip modes for multi-pass
editing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.attention import LocalAttention
from fastvideo_tpu.layers.embeddings import Embedding, timestep_embedding
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.mlp import MLP
from fastvideo_tpu.layers.norm import (FP32LayerNorm,
                                       ScaleResidualLayerNormScaleShift)

Array = jax.Array


class GlmImageKVCache:
    """Per-layer condition K/V store (reference :19-63); mode is
    ``write`` (append), ``read`` (prepend to current k/v) or ``skip``."""

    def __init__(self, num_layers: int):
        self.kv = [None] * num_layers
        self.mode: str | None = None

    def set_mode(self, mode: str | None):
        assert mode in (None, "write", "read", "skip")
        self.mode = mode

    def clear(self):
        self.kv = [None] * len(self.kv)
        self.mode = None


def _apply_rope_neox(x: Array, cos: Array, sin: Array) -> Array:
    """Half-split rotation; x [B, S, H, D], cos/sin [S, D/2]."""
    xf = x.astype(jnp.float32)
    first, second = jnp.split(xf, 2, axis=-1)
    cos_b = cos[None, :, None].astype(jnp.float32)
    sin_b = sin[None, :, None].astype(jnp.float32)
    out_first = first * cos_b - second * sin_b
    out_second = second * cos_b + first * sin_b
    return jnp.concatenate([out_first, out_second], -1).astype(x.dtype)


@functools.lru_cache(maxsize=32)
def glm_image_rope(height: int, width: int, dim: int,
                   theta: float = 10000.0) -> tuple[np.ndarray, np.ndarray]:
    """2-axis (h|w) tables [H*W, dim/2] (reference :508-557)."""
    dim_h = dim // 2
    inv = 1.0 / (theta**(np.arange(0, dim_h, 2,
                                   dtype=np.float32)[:dim_h // 2] / dim_h))
    fh = np.outer(np.arange(height, dtype=np.float32), inv)
    fw = np.outer(np.arange(width, dtype=np.float32), inv)
    freqs = np.concatenate([
        np.broadcast_to(fh[:, None], (height, width, fh.shape[-1])),
        np.broadcast_to(fw[None], (height, width, fw.shape[-1])),
    ], -1).reshape(height * width, -1)
    return np.cos(freqs), np.sin(freqs)


class GlmImageTimestepEmbedding(nnx.Module):
    def __init__(self, in_channels: int, time_embed_dim: int,
                 out_dim: int | None = None, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.linear_1 = Linear(in_channels, time_embed_dim, **kw)
        self.linear_2 = Linear(time_embed_dim, out_dim or time_embed_dim,
                               **kw)

    def __call__(self, x: Array) -> Array:
        return self.linear_2(jax.nn.silu(self.linear_1(x)))


class GlmImageCombinedTimestepSizeEmbeddings(nnx.Module):
    """timestep + SDXL-style (crop, target-size) sincos conditions
    (reference :125-175)."""

    def __init__(self, embedding_dim: int, condition_dim: int,
                 pooled_projection_dim: int, timesteps_dim: int, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.condition_dim = condition_dim
        self.timesteps_dim = timesteps_dim
        self.timestep_embedder = GlmImageTimestepEmbedding(
            timesteps_dim, embedding_dim, **kw)
        self.condition_embedder = _TextProjection(pooled_projection_dim,
                                                  embedding_dim, **kw)

    def __call__(self, timestep: Array, target_size: Array,
                 crop_coords: Array, dtype) -> Array:
        t_proj = timestep_embedding(timestep, self.timesteps_dim)
        crop = timestep_embedding(crop_coords.reshape(-1),
                                  self.condition_dim).reshape(
                                      crop_coords.shape[0], -1)
        tgt = timestep_embedding(target_size.reshape(-1),
                                 self.condition_dim).reshape(
                                     target_size.shape[0], -1)
        cond = jnp.concatenate([crop, tgt], axis=1)
        return (self.timestep_embedder(t_proj.astype(dtype)) +
                self.condition_embedder(cond.astype(dtype)))


class _TextProjection(nnx.Module):
    def __init__(self, in_features: int, hidden_size: int, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.linear_1 = Linear(in_features, hidden_size, **kw)
        self.linear_2 = Linear(hidden_size, hidden_size, **kw)

    def __call__(self, x: Array) -> Array:
        return self.linear_2(jax.nn.silu(self.linear_1(x)))


class GlmImageAdaLayerNormZero(nnx.Module):
    """12-chunk dual-stream AdaLN (reference :217-272)."""

    def __init__(self, embedding_dim: int, dim: int, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm = FP32LayerNorm(dim, 1e-5, False, **kw)
        self.norm_context = FP32LayerNorm(dim, 1e-5, False, **kw)
        self.linear = Linear(embedding_dim, 12 * dim, **kw)

    def __call__(self, x: Array, ctx: Array, temb: Array):
        dtype = x.dtype
        nx = self.norm(x).astype(dtype)
        nc = self.norm_context(ctx).astype(dtype)
        mods = jnp.split(self.linear(temb), 12, axis=1)
        (shift_msa, c_shift_msa, scale_msa, c_scale_msa, gate_msa,
         c_gate_msa, shift_mlp, c_shift_mlp, scale_mlp, c_scale_mlp,
         gate_mlp, c_gate_mlp) = mods
        nx = nx * (1 + scale_msa[:, None]) + shift_msa[:, None]
        nc = nc * (1 + c_scale_msa[:, None]) + c_shift_msa[:, None]
        return (nx, gate_msa, shift_mlp, scale_mlp, gate_mlp, nc,
                c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp)


class GlmImageAttention(nnx.Module):
    """Shared-projection joint attention with per-head LayerNorm qk norm
    (affine-free) and neox rope on image tokens (reference :278-395)."""

    def __init__(self, dim: int, heads: int, dim_head: int, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.heads = heads
        self.dim_head = dim_head
        inner = heads * dim_head
        self.to_q = Linear(dim, inner, **kw)
        self.to_k = Linear(dim, inner, **kw)
        self.to_v = Linear(dim, inner, **kw)
        self.to_out = Linear(inner, dim, **kw)
        self.norm_q = FP32LayerNorm(dim_head, 1e-5, False, **kw)
        self.norm_k = FP32LayerNorm(dim_head, 1e-5, False, **kw)
        self.attn = LocalAttention(heads, dim_head)

    def __call__(self, x: Array, ctx: Array, rope, layer_cache=None,
                 cache_mode: str | None = None):
        dtype = x.dtype
        b, text_len = ctx.shape[:2]
        h = jnp.concatenate([ctx, x], axis=1)
        s = h.shape[1]
        q = self.to_q(h).reshape(b, s, self.heads, self.dim_head)
        k = self.to_k(h).reshape(b, s, self.heads, self.dim_head)
        v = self.to_v(h).reshape(b, s, self.heads, self.dim_head)
        q = self.norm_q(q).astype(dtype)
        k = self.norm_k(k).astype(dtype)
        if rope is not None:
            cos, sin = rope
            q = jnp.concatenate([
                q[:, :text_len],
                _apply_rope_neox(q[:, text_len:], cos, sin)
            ], axis=1)
            k = jnp.concatenate([
                k[:, :text_len],
                _apply_rope_neox(k[:, text_len:], cos, sin)
            ], axis=1)
        if layer_cache is not None and cache_mode == "write":
            layer_cache.append((k, v))
        if layer_cache is not None and cache_mode == "read" and layer_cache:
            ks = [c[0] for c in layer_cache] + [k]
            vs = [c[1] for c in layer_cache] + [v]
            k = jnp.concatenate(ks, axis=1)
            v = jnp.concatenate(vs, axis=1)
        out = self.attn(q, k, v).reshape(b, s, -1).astype(dtype)
        out = self.to_out(out)
        return out[:, text_len:], out[:, :text_len]


class GlmImageTransformerBlock(nnx.Module):
    """(reference :401-502); ONE shared ff for both streams."""

    def __init__(self, dim: int, num_heads: int, head_dim: int,
                 time_embed_dim: int, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm1 = GlmImageAdaLayerNormZero(time_embed_dim, dim, **kw)
        self.attn1 = GlmImageAttention(dim, num_heads, head_dim, **kw)
        self.norm2 = ScaleResidualLayerNormScaleShift(
            dim, "layer", eps=1e-5, elementwise_affine=False, **kw)
        self.norm2_context = ScaleResidualLayerNormScaleShift(
            dim, "layer", eps=1e-5, elementwise_affine=False, **kw)
        self.ff = MLP(dim, dim * 4, dim, act_type="gelu_pytorch_tanh", **kw)

    def __call__(self, x: Array, ctx: Array, temb: Array, rope,
                 layer_cache=None, cache_mode=None):
        (nx, gate_msa, shift_mlp, scale_mlp, gate_mlp, nc, c_gate_msa,
         c_shift_mlp, c_scale_mlp, c_gate_mlp) = self.norm1(x, ctx, temb)
        attn_x, attn_c = self.attn1(nx, nc, rope, layer_cache, cache_mode)
        nx, x = self.norm2(x, attn_x, gate_msa[:, None], shift_mlp[:, None],
                           scale_mlp[:, None])
        nc, ctx = self.norm2_context(ctx, attn_c, c_gate_msa[:, None],
                                     c_shift_mlp[:, None],
                                     c_scale_mlp[:, None])
        x = x + self.ff(nx) * gate_mlp[:, None]
        ctx = ctx + self.ff(nc) * c_gate_mlp[:, None]
        return x, ctx


class GlmImageAdaLayerNormContinuous(nnx.Module):
    """(reference :563-591); (scale, shift) chunk order."""

    def __init__(self, embedding_dim: int, cond_dim: int, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.linear = Linear(cond_dim, embedding_dim * 2, **kw)
        self.norm = FP32LayerNorm(embedding_dim, 1e-5, False, **kw)

    def __call__(self, x: Array, cond: Array) -> Array:
        scale, shift = jnp.split(self.linear(cond.astype(x.dtype)), 2,
                                 axis=1)
        return self.norm(x).astype(x.dtype) * (1 + scale)[:, None] + \
            shift[:, None]


class GlmImageTransformer2DModel(nnx.Module):
    """(reference :597-773)."""

    def __init__(self, config, *, param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        arch = config
        inner = arch.num_attention_heads * arch.attention_head_dim
        self.inner_dim = inner
        self.patch_size = arch.patch_size
        self.out_channels = arch.out_channels

        self.image_proj = Linear(arch.in_channels * arch.patch_size**2,
                                 inner, **kw)
        self.glyph_projector = MLP(arch.text_embed_dim, inner, inner,
                                   act_type="gelu", **kw)
        self.prior_token_embedding = Embedding(
            arch.prior_vq_quantizer_codebook_size, inner, **kw)
        self.prior_projector = MLP(inner, inner, inner, act_type="silu",
                                   **kw)
        self.time_condition_embed = GlmImageCombinedTimestepSizeEmbeddings(
            arch.time_embed_dim, arch.condition_dim,
            2 * 2 * arch.condition_dim, arch.time_embed_dim, **kw)
        self.transformer_blocks = nnx.List([
            GlmImageTransformerBlock(inner, arch.num_attention_heads,
                                     arch.attention_head_dim,
                                     arch.time_embed_dim, **kw)
            for _ in range(arch.num_layers)
        ])
        self.norm_out = GlmImageAdaLayerNormContinuous(
            inner, arch.time_embed_dim, **kw)
        self.proj_out = Linear(inner,
                               arch.patch_size**2 * arch.out_channels, **kw)

    def __call__(self, hidden_states: Array, encoder_hidden_states,
                 prior_token_id: Array, prior_token_drop: Array,
                 timestep: Array, target_size: Array, crop_coords: Array,
                 kv_caches: GlmImageKVCache | None = None,
                 kv_caches_mode: str | None = None, **kwargs) -> Array:
        arch = self.config
        if isinstance(encoder_hidden_states, (list, tuple)):
            encoder_hidden_states = encoder_hidden_states[0]
        b, c, height, width = hidden_states.shape
        p = self.patch_size
        ph, pw = height // p, width // p

        cos, sin = glm_image_rope(ph, pw, arch.attention_head_dim)
        rope = (jnp.asarray(cos), jnp.asarray(sin))

        x = hidden_states.reshape(b, c, ph, p, pw, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, ph * pw, -1)
        x = self.image_proj(x.astype(self.image_proj.kernel.value.dtype))
        ctx = self.glyph_projector(
            encoder_hidden_states.astype(x.dtype))
        prior = self.prior_token_embedding(prior_token_id).astype(x.dtype)
        keep = (~prior_token_drop.astype(bool)).astype(x.dtype)
        while keep.ndim < prior.ndim:
            keep = keep[..., None]
        x = x + self.prior_projector(prior * keep)

        temb = self.time_condition_embed(timestep, target_size, crop_coords,
                                         x.dtype)
        temb = jax.nn.silu(temb)

        if kv_caches is not None:
            kv_caches.set_mode(kv_caches_mode)
        for idx, block in enumerate(self.transformer_blocks):
            layer_cache = None
            mode = None
            if kv_caches is not None and kv_caches.mode not in (None,
                                                                "skip"):
                mode = kv_caches.mode
                if kv_caches.kv[idx] is None:
                    kv_caches.kv[idx] = []
                layer_cache = kv_caches.kv[idx]
            x, ctx = block(x, ctx, temb, rope, layer_cache, mode)

        x = self.norm_out(x, temb)
        x = self.proj_out(x)
        x = x.reshape(b, ph, pw, self.out_channels, p, p)
        x = x.transpose(0, 3, 1, 4, 2, 5).reshape(b, self.out_channels,
                                                  height, width)
        return x.astype(jnp.float32)


EntryClass = GlmImageTransformer2DModel
