"""GEN3C DiT: video-conditioned Cosmos-style transformer with 3D cache.

Behavioral reference: /root/reference/fastvideo/models/dits/gen3c.py
(:40-1021): input channels concat [latent(16) | cond mask(1) |
frame-buffer pose caches(frame_buffer_max*32) | padding mask(1)];
AdaLN-LoRA conditioning (per-block SiLU -> bottleneck -> 3*D, plus a
shared 3*D lora from the timestep embedder); half-split 3-axis NTK rope
with FPS modulation; normalized learnable per-axis positional
embeddings; augment-sigma embedding added to the affine embedding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.attention import DistributedAttention, LocalAttention
from fastvideo_tpu.layers.embeddings import timestep_embedding
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.mlp import MLP
from fastvideo_tpu.layers.norm import FP32LayerNorm, RMSNorm

Array = jax.Array


def _apply_rope_halfsplit(x: Array, cos: Array, sin: Array) -> Array:
    """x [B, S, H, D]; cos/sin [S, D] built as [t|h|w, t|h|w]."""
    xf = x.astype(jnp.float32)
    first, second = jnp.split(xf, 2, axis=-1)
    cos_b = cos[None, :, None].astype(jnp.float32)
    sin_b = sin[None, :, None].astype(jnp.float32)
    rot = jnp.concatenate([-second, first], axis=-1)
    return (xf * cos_b + rot * sin_b).astype(x.dtype)


@functools.lru_cache(maxsize=16)
def gen3c_rope(grid: tuple[int, int, int], head_dim: int,
               rope_scale: tuple[float, float, float],
               fps: float | None, base_fps: float,
               enable_fps: bool) -> tuple[np.ndarray, np.ndarray]:
    """NTK-scaled 3-axis half-split rope tables (reference :550-626)."""
    t, h, w = grid
    dim_h = head_dim // 6 * 2
    dim_w = head_dim // 6 * 2
    dim_t = head_dim - dim_h - dim_w
    h_theta = 10000.0 * rope_scale[1]**(dim_h / (dim_h - 2))
    w_theta = 10000.0 * rope_scale[2]**(dim_w / (dim_w - 2))
    t_theta = 10000.0 * rope_scale[0]**(dim_t / (dim_t - 2))

    fh = 1.0 / h_theta**(np.arange(0, dim_h, 2,
                                   dtype=np.float32)[:dim_h // 2] / dim_h)
    fw = 1.0 / w_theta**(np.arange(0, dim_w, 2,
                                   dtype=np.float32)[:dim_w // 2] / dim_w)
    ft = 1.0 / t_theta**(np.arange(0, dim_t, 2,
                                   dtype=np.float32)[:dim_t // 2] / dim_t)
    t_pos = np.arange(t, dtype=np.float32)
    if enable_fps and fps is not None:
        t_pos = t_pos / fps * base_fps
    emb_t = np.outer(t_pos, ft)[:, None, None]
    emb_h = np.outer(np.arange(h, dtype=np.float32), fh)[None, :, None]
    emb_w = np.outer(np.arange(w, dtype=np.float32), fw)[None, None]
    emb_t = np.broadcast_to(emb_t, (t, h, w, emb_t.shape[-1]))
    emb_h = np.broadcast_to(emb_h, (t, h, w, emb_h.shape[-1]))
    emb_w = np.broadcast_to(emb_w, (t, h, w, emb_w.shape[-1]))
    freqs = np.concatenate([emb_t, emb_h, emb_w] * 2,
                           axis=-1).reshape(t * h * w, -1)
    return np.cos(freqs), np.sin(freqs)


class Gen3CTimestepEmbedding(nnx.Module):
    """(reference :98-148): with adaln-lora, the 'standard' embedding is
    the raw sinusoid and linear_2's 3*D output feeds the lora path."""

    def __init__(self, in_features: int, out_features: int,
                 use_adaln_lora: bool = True, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.use_adaln_lora = use_adaln_lora
        self.linear_1 = Linear(in_features, out_features, bias=False, **kw)
        self.linear_2 = Linear(out_features,
                               3 * out_features if use_adaln_lora else
                               out_features, bias=False, **kw)

    def __call__(self, sample: Array):
        emb = self.linear_2(jax.nn.silu(self.linear_1(sample)))
        if self.use_adaln_lora:
            return sample, emb
        return emb, None


class Gen3CEmbedding(nnx.Module):
    def __init__(self, embedding_dim: int, condition_dim: int,
                 use_adaln_lora: bool = True, *, param_dtype,
                 rngs: nnx.Rngs):
        self.embedding_dim = embedding_dim
        self.t_embedder = Gen3CTimestepEmbedding(
            embedding_dim, condition_dim, use_adaln_lora,
            param_dtype=param_dtype, rngs=rngs)

    def __call__(self, timestep: Array, dtype):
        proj = timestep_embedding(timestep.reshape(-1),
                                  self.embedding_dim).astype(dtype)
        return self.t_embedder(proj)


class _AdaLNStack(nnx.Module):
    """SiLU -> (bottleneck ->) N*D projection (reference :432-459)."""

    def __init__(self, hidden_size: int, out_mult: int, adaln_lora_dim: int,
                 use_adaln_lora: bool, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.use_adaln_lora = use_adaln_lora
        if use_adaln_lora:
            self.linear_1 = Linear(hidden_size, adaln_lora_dim, bias=False,
                                   **kw)
            self.linear_2 = Linear(adaln_lora_dim, out_mult * hidden_size,
                                   bias=False, **kw)
        else:
            self.linear_1 = Linear(hidden_size, out_mult * hidden_size,
                                   bias=False, **kw)
            self.linear_2 = None

    def __call__(self, x: Array) -> Array:
        out = self.linear_1(jax.nn.silu(x))
        if self.linear_2 is not None:
            out = self.linear_2(out)
        return out


class Gen3CSelfAttention(nnx.Module):
    def __init__(self, dim: int, num_heads: int, qk_norm: bool = True,
                 eps: float = 1e-6, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.to_q = Linear(dim, dim, bias=False, **kw)
        self.to_k = Linear(dim, dim, bias=False, **kw)
        self.to_v = Linear(dim, dim, bias=False, **kw)
        self.to_out = Linear(dim, dim, bias=False, **kw)
        self.norm_q = RMSNorm(self.head_dim, eps=eps, **kw) if qk_norm \
            else None
        self.norm_k = RMSNorm(self.head_dim, eps=eps, **kw) if qk_norm \
            else None
        self.attn = DistributedAttention(num_heads, self.head_dim)

    def __call__(self, x: Array, rope_emb=None) -> Array:
        b, s, _ = x.shape
        q = self.to_q(x).reshape(b, s, self.num_heads, self.head_dim)
        k = self.to_k(x).reshape(b, s, self.num_heads, self.head_dim)
        v = self.to_v(x).reshape(b, s, self.num_heads, self.head_dim)
        if self.norm_q is not None:
            q = self.norm_q(q).astype(x.dtype)
            k = self.norm_k(k).astype(x.dtype)
        if rope_emb is not None:
            cos, sin = rope_emb
            q = _apply_rope_halfsplit(q, cos, sin)
            k = _apply_rope_halfsplit(k, cos, sin)
        out = self.attn(q, k, v)
        return self.to_out(out.reshape(b, s, -1))


class Gen3CCrossAttention(nnx.Module):
    def __init__(self, dim: int, cross_dim: int, num_heads: int,
                 qk_norm: bool = True, eps: float = 1e-6, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.to_q = Linear(dim, dim, bias=False, **kw)
        self.to_k = Linear(cross_dim, dim, bias=False, **kw)
        self.to_v = Linear(cross_dim, dim, bias=False, **kw)
        self.to_out = Linear(dim, dim, bias=False, **kw)
        self.norm_q = RMSNorm(self.head_dim, eps=eps, **kw) if qk_norm \
            else None
        self.norm_k = RMSNorm(self.head_dim, eps=eps, **kw) if qk_norm \
            else None
        self.attn = LocalAttention(num_heads, self.head_dim)

    def __call__(self, x: Array, context: Array) -> Array:
        b, s, _ = x.shape
        m = context.shape[1]
        q = self.to_q(x).reshape(b, s, self.num_heads, self.head_dim)
        k = self.to_k(context).reshape(b, m, self.num_heads, self.head_dim)
        v = self.to_v(context).reshape(b, m, self.num_heads, self.head_dim)
        if self.norm_q is not None:
            q = self.norm_q(q).astype(x.dtype)
            k = self.norm_k(k).astype(x.dtype)
        return self.to_out(self.attn(q, k, v).reshape(b, s, -1))


class Gen3CTransformerBlock(nnx.Module):
    """(reference :387-547)."""

    def __init__(self, num_heads: int, head_dim: int, cross_dim: int,
                 mlp_ratio: float, adaln_lora_dim: int,
                 use_adaln_lora: bool, qk_norm: bool, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        hidden = num_heads * head_dim
        self.use_adaln_lora = use_adaln_lora
        self.norm1 = FP32LayerNorm(hidden, 1e-6, False, **kw)
        self.norm2 = FP32LayerNorm(hidden, 1e-6, False, **kw)
        self.norm3 = FP32LayerNorm(hidden, 1e-6, False, **kw)
        self.attn1 = Gen3CSelfAttention(hidden, num_heads, qk_norm, **kw)
        self.attn2 = Gen3CCrossAttention(hidden, cross_dim, num_heads,
                                         qk_norm, **kw)
        self.mlp = MLP(hidden, int(hidden * mlp_ratio), act_type="gelu",
                       bias=False, **kw)
        self.adaln_self = _AdaLNStack(hidden, 3, adaln_lora_dim,
                                      use_adaln_lora, **kw)
        self.adaln_cross = _AdaLNStack(hidden, 3, adaln_lora_dim,
                                       use_adaln_lora, **kw)
        self.adaln_mlp = _AdaLNStack(hidden, 3, adaln_lora_dim,
                                     use_adaln_lora, **kw)

    def _mods(self, stack, affine_emb, adaln_lora):
        out = stack(affine_emb)
        if self.use_adaln_lora and adaln_lora is not None:
            out = out + adaln_lora
        return [m[:, None] for m in jnp.split(out, 3, axis=-1)]

    def __call__(self, x: Array, context: Array, affine_emb: Array,
                 adaln_lora: Array | None, rope_emb,
                 extra_pos_emb: Array | None = None) -> Array:
        if extra_pos_emb is not None:
            x = x + extra_pos_emb
        shift_sa, scale_sa, gate_sa = self._mods(self.adaln_self,
                                                 affine_emb, adaln_lora)
        shift_ca, scale_ca, gate_ca = self._mods(self.adaln_cross,
                                                 affine_emb, adaln_lora)
        shift_mlp, scale_mlp, gate_mlp = self._mods(self.adaln_mlp,
                                                    affine_emb, adaln_lora)
        dtype = x.dtype

        def mod(norm, h, shift, scale):
            return (norm(h).astype(dtype) * (1 + scale.astype(dtype)) +
                    shift.astype(dtype))

        x = x + gate_sa.astype(dtype) * self.attn1(
            mod(self.norm1, x, shift_sa, scale_sa), rope_emb)
        x = x + gate_ca.astype(dtype) * self.attn2(
            mod(self.norm2, x, shift_ca, scale_ca), context)
        x = x + gate_mlp.astype(dtype) * self.mlp(
            mod(self.norm3, x, shift_mlp, scale_mlp))
        return x


class Gen3CLearnablePositionalEmbed(nnx.Module):
    """Normalized per-axis learnable embeddings (reference :629-669)."""

    def __init__(self, hidden_size: int, max_size: tuple[int, int, int],
                 patch_size: tuple[int, int, int], eps: float = 1e-6, *,
                 param_dtype, rngs: nnx.Rngs):
        del rngs
        self.eps = eps
        sizes = [s // p for s, p in zip(max_size, patch_size)]
        self.pos_emb_t = nnx.Param(jnp.zeros((sizes[0], hidden_size),
                                             param_dtype))
        self.pos_emb_h = nnx.Param(jnp.zeros((sizes[1], hidden_size),
                                             param_dtype))
        self.pos_emb_w = nnx.Param(jnp.zeros((sizes[2], hidden_size),
                                             param_dtype))

    def __call__(self, grid: tuple[int, int, int], dtype) -> Array:
        t, h, w = grid
        emb = (self.pos_emb_t.value[:t][:, None, None] +
               self.pos_emb_h.value[:h][None, :, None] +
               self.pos_emb_w.value[:w][None, None, :])
        emb = emb.astype(jnp.float32)
        norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
        # reference: eps + norm * sqrt(numel(norm)/numel(emb)) = eps +
        # norm / sqrt(D)
        norm = self.eps + norm * np.sqrt(1.0 / emb.shape[-1])
        return (emb / norm).reshape(1, t * h * w, -1).astype(dtype)


class Gen3CFinalLayer(nnx.Module):
    """(reference :672-745)."""

    def __init__(self, hidden_size: int, out_channels: int,
                 patch_size: tuple[int, int, int], adaln_lora_dim: int,
                 use_adaln_lora: bool, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.hidden_size = hidden_size
        self.use_adaln_lora = use_adaln_lora
        self.norm = FP32LayerNorm(hidden_size, 1e-6, False, **kw)
        self.adaln = _AdaLNStack(hidden_size, 2, adaln_lora_dim,
                                 use_adaln_lora, **kw)
        out_dim = out_channels * patch_size[0] * patch_size[1] * patch_size[2]
        self.proj_out = Linear(hidden_size, out_dim, bias=False, **kw)

    def __call__(self, x: Array, affine_emb: Array,
                 adaln_lora: Array | None) -> Array:
        mod = self.adaln(affine_emb)
        if self.use_adaln_lora and adaln_lora is not None:
            mod = mod + adaln_lora[..., :2 * self.hidden_size]
        shift, scale = jnp.split(mod, 2, axis=-1)
        h = self.norm(x).astype(x.dtype)
        h = h * (1 + scale[:, None].astype(x.dtype)) + \
            shift[:, None].astype(x.dtype)
        return self.proj_out(h)


class Gen3CTransformer3DModel(nnx.Module):
    """(reference :748-1021)."""

    def __init__(self, config, *, param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        arch = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        inner = arch.num_attention_heads * arch.attention_head_dim
        self.inner_dim = inner
        self.patch_size = tuple(arch.patch_size)
        self.out_channels = arch.out_channels
        self.frame_buffer_max = arch.frame_buffer_max
        # 2 latent blocks (image + mask) per buffer; 32/buffer at the
        # production 16-channel VAE (reference gen3c_stages.py:307)
        self.buffer_channels = arch.frame_buffer_max * \
            getattr(arch, "channels_per_buffer", 32)
        self.concat_padding_mask = arch.concat_padding_mask
        self.use_adaln_lora = arch.use_adaln_lora
        self.add_augment_sigma_embedding = getattr(
            arch, "add_augment_sigma_embedding", True)

        pe_in = arch.in_channels + 1 + self.buffer_channels
        if arch.concat_padding_mask:
            pe_in += 1
        pt, ph, pw = self.patch_size
        self.patch_embed = Linear(pe_in * pt * ph * pw, inner, bias=False,
                                  **kw)
        self.learnable_pos_embed = (Gen3CLearnablePositionalEmbed(
            inner, tuple(arch.max_size), self.patch_size, **kw) if getattr(
                arch, "extra_pos_embed_type", "learnable") == "learnable"
                                    else None)
        self.time_embed = Gen3CEmbedding(inner, inner, arch.use_adaln_lora,
                                         **kw)
        if self.add_augment_sigma_embedding:
            self.augment_sigma_embed = Gen3CEmbedding(
                inner, inner, arch.use_adaln_lora, **kw)
        self.affine_norm = (RMSNorm(inner, eps=arch.eps, **kw) if getattr(
            arch, "affine_emb_norm", True) else None)
        self.transformer_blocks = nnx.List([
            Gen3CTransformerBlock(arch.num_attention_heads,
                                  arch.attention_head_dim,
                                  arch.text_embed_dim, arch.mlp_ratio,
                                  arch.adaln_lora_dim, arch.use_adaln_lora,
                                  arch.qk_norm == "rms_norm", **kw)
            for _ in range(arch.num_layers)
        ])
        self.final_layer = Gen3CFinalLayer(inner, arch.out_channels,
                                           self.patch_size,
                                           arch.adaln_lora_dim,
                                           arch.use_adaln_lora, **kw)

    def __call__(self, hidden_states: Array, timestep: Array,
                 encoder_hidden_states, fps: int | None = None,
                 condition_video_input_mask: Array | None = None,
                 condition_video_pose: Array | None = None,
                 condition_video_augment_sigma: Array | None = None,
                 padding_mask: Array | None = None, **kwargs) -> Array:
        arch = self.config
        if isinstance(encoder_hidden_states, (list, tuple)):
            encoder_hidden_states = encoder_hidden_states[0]
        b, c, t, h, w = hidden_states.shape
        if condition_video_input_mask is None:
            condition_video_input_mask = jnp.zeros((b, 1, t, h, w),
                                                   hidden_states.dtype)
        x = jnp.concatenate([hidden_states, condition_video_input_mask],
                            axis=1)
        if condition_video_pose is None:
            condition_video_pose = jnp.zeros(
                (b, self.buffer_channels, t, h, w), hidden_states.dtype)
        x = jnp.concatenate([x, condition_video_pose], axis=1)
        if self.concat_padding_mask:
            if padding_mask is None:
                padding_mask = jnp.ones((b, 1, h, w), hidden_states.dtype)
            x = jnp.concatenate(
                [x,
                 jnp.broadcast_to(padding_mask[:, :, None],
                                  (b, 1, t, h, w))], axis=1)

        pt, ph, pw = self.patch_size
        gt, gh, gw = t // pt, h // ph, w // pw
        cin = x.shape[1]
        x = x.reshape(b, cin, gt, pt, gh, ph, gw, pw)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(b, gt * gh * gw, -1)
        x = self.patch_embed(x.astype(self.patch_embed.kernel.value.dtype))

        cos, sin = gen3c_rope(
            (gt, gh, gw), arch.attention_head_dim, tuple(arch.rope_scale),
            float(fps) if fps is not None else None, 24.0,
            getattr(arch, "rope_enable_fps_modulation", True))
        rope_emb = (jnp.asarray(cos), jnp.asarray(sin))
        extra_pos = (self.learnable_pos_embed(
            (gt, gh, gw), x.dtype) if self.learnable_pos_embed is not None
                     else None)

        affine_emb, adaln_lora = self.time_embed(timestep, x.dtype)
        if self.add_augment_sigma_embedding:
            if condition_video_augment_sigma is None:
                condition_video_augment_sigma = jnp.zeros_like(timestep)
            aug_emb, _ = self.augment_sigma_embed(
                condition_video_augment_sigma, x.dtype)
            affine_emb = affine_emb + aug_emb
        if self.affine_norm is not None:
            affine_emb = self.affine_norm(affine_emb).astype(x.dtype)

        ctx = encoder_hidden_states.astype(x.dtype)
        for block in self.transformer_blocks:
            x = block(x, ctx, affine_emb, adaln_lora, rope_emb, extra_pos)

        x = self.final_layer(x, affine_emb, adaln_lora)
        x = x.reshape(b, gt, gh, gw, pt, ph, pw, self.out_channels)
        x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6).reshape(
            b, self.out_channels, t, h, w)
        return x


EntryClass = Gen3CTransformer3DModel
