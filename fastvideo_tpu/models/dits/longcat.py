"""LongCat-Video DiT, TPU-native.

Behavioral reference: /root/reference/fastvideo/models/dits/longcat.py
(:29-1146): single-stream blocks with per-frame AdaLN modulation (the
timestep embedding is per-latent-frame [B, T, 512]; modulation params
broadcast over each frame's spatial tokens), self-attention with 3D
interleaved RoPE (Wan-style head-dim split, base 10000) and per-head RMS
q/k norms, affine-LN text cross-attention, and a SwiGLU FFN whose hidden
dim is round-up-256(dim * mlp_ratio * 2/3). I2V/VC conditioning uses
split attention: the first ``num_cond_latents`` frames attend only among
themselves and receive zero cross-attention output, while noise tokens
attend over the full sequence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.attention import DistributedAttention, LocalAttention
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.norm import FP32LayerNorm, RMSNorm
from fastvideo_tpu.layers.rotary import (apply_rotary_emb,
                                         get_nd_rotary_pos_embed,
                                         wan_rope_dim_list)

Array = jax.Array


def _sinusoidal(t: Array, dim: int, max_period: float = 10000.0) -> Array:
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class LongCatTimestepEmbedder(nnx.Module):
    """256-dim sinusoid -> 512-dim AdaLN embedding (reference :74-147)."""

    def __init__(self, freq_dim: int, tembed_dim: int, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.freq_dim = freq_dim
        self.linear_1 = Linear(freq_dim, tembed_dim, **kw)
        self.linear_2 = Linear(tembed_dim, tembed_dim, **kw)

    def __call__(self, t: Array) -> Array:
        emb = _sinusoidal(t.reshape(-1), self.freq_dim)
        emb = emb.astype(self.linear_1.kernel.value.dtype)
        return self.linear_2(jax.nn.silu(self.linear_1(emb)))


class LongCatCaptionEmbedder(nnx.Module):
    """2-layer tanh-GELU text projection with zero-padded masking
    (reference :150-226)."""

    def __init__(self, caption_channels: int, hidden_size: int,
                 text_tokens_zero_pad: bool = True, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.text_tokens_zero_pad = text_tokens_zero_pad
        self.linear_1 = Linear(caption_channels, hidden_size, **kw)
        self.linear_2 = Linear(hidden_size, hidden_size, **kw)

    def __call__(self, text: Array, mask: Array | None = None) -> Array:
        y = self.linear_2(jax.nn.gelu(self.linear_1(text), approximate=True))
        if mask is not None and self.text_tokens_zero_pad:
            y = y * mask.astype(y.dtype)[:, :y.shape[1], None]
        return y


class LongCatSwiGLUFFN(nnx.Module):
    """w2(SiLU(w1(x)) * w3(x)), bias-free (reference :647-677)."""

    def __init__(self, dim: int, hidden_dim: int, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.w1 = Linear(dim, hidden_dim, bias=False, **kw)
        self.w3 = Linear(dim, hidden_dim, bias=False, **kw)
        self.w2 = Linear(hidden_dim, dim, bias=False, **kw)

    def __call__(self, x: Array) -> Array:
        return self.w2(jax.nn.silu(self.w1(x)) * self.w3(x))


def ffn_hidden_dim(hidden_size: int, mlp_ratio: float) -> int:
    """round-up-256 of dim * mlp_ratio * 2/3 (reference :763-765)."""
    d = int(hidden_size * mlp_ratio * 2 / 3)
    return 256 * ((d + 255) // 256)


class LongCatSelfAttention(nnx.Module):
    """Self-attention with 3D RoPE and I2V split attention
    (reference :233-421)."""

    def __init__(self, dim: int, num_heads: int, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        # fused qkv, matching the original checkpoint layout (one MXU
        # matmul instead of three)
        self.qkv = Linear(dim, 3 * dim, **kw)
        self.q_norm = RMSNorm(self.head_dim, eps=1e-6, **kw)
        self.k_norm = RMSNorm(self.head_dim, eps=1e-6, **kw)
        self.to_out = Linear(dim, dim, **kw)
        self.attn = DistributedAttention(num_heads, self.head_dim)
        self.local_attn = LocalAttention(num_heads, self.head_dim)

    def _qkv(self, x: Array):
        b, n, _ = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.num_heads, self.head_dim)
        q = self.q_norm(qkv[:, :, 0]).astype(x.dtype)
        k = self.k_norm(qkv[:, :, 1]).astype(x.dtype)
        return q, k, qkv[:, :, 2]

    def __call__(self, x: Array, latent_shape: tuple[int, int, int],
                 num_cond_latents: int = 0,
                 kv_cache: tuple[Array, Array] | None = None):
        b, n, c = x.shape
        t, h, w = latent_shape
        q, k, v = self._qkv(x)

        if kv_cache is not None:
            # VC long-video continuation (reference :423-509): x holds only
            # noise tokens; cached PRE-RoPE cond K/V are prepended and the
            # full sequence gets RoPE so noise positions start after the
            # conditioning frames.
            k_cache, v_cache = kv_cache
            n_cond = k_cache.shape[1]
            n_cond_t = n_cond // (n // t)
            cos, sin = get_nd_rotary_pos_embed(
                wan_rope_dim_list(self.head_dim), (t + n_cond_t, h, w))
            cos, sin = jnp.asarray(cos), jnp.asarray(sin)
            k_full = jnp.concatenate([k_cache.astype(k.dtype), k], axis=1)
            v_full = jnp.concatenate([v_cache.astype(v.dtype), v], axis=1)
            k_full = apply_rotary_emb(k_full, cos, sin)
            q = apply_rotary_emb(q, cos[n_cond:], sin[n_cond:])
            out = self.local_attn(q, k_full, v_full)
            return self.to_out(out.reshape(b, n, c))

        cos, sin = get_nd_rotary_pos_embed(wan_rope_dim_list(self.head_dim),
                                           (t, h, w))
        cos, sin = jnp.asarray(cos), jnp.asarray(sin)
        k_pre = k  # pre-RoPE (cache contract, reference :311-315)
        q = apply_rotary_emb(q, cos, sin)
        k = apply_rotary_emb(k, cos, sin)

        if num_cond_latents > 0:
            # I2V split attention (reference :328-370)
            n_cond = num_cond_latents * (n // t)
            out_cond = self.local_attn(q[:, :n_cond], k[:, :n_cond],
                                       v[:, :n_cond])
            out_noise = self.local_attn(q[:, n_cond:], k, v)
            out = jnp.concatenate([out_cond, out_noise], axis=1)
        else:
            out = self.attn(q, k, v)
        return self.to_out(out.reshape(b, n, c)), (k_pre, v)


class LongCatCrossAttention(nnx.Module):
    """Text cross-attention (reference :512-640); cond tokens get zero
    output in I2V mode."""

    def __init__(self, dim: int, num_heads: int, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.q_linear = Linear(dim, dim, **kw)
        self.kv_linear = Linear(dim, 2 * dim, **kw)  # fused, ckpt layout
        self.q_norm = RMSNorm(self.head_dim, eps=1e-6, **kw)
        self.k_norm = RMSNorm(self.head_dim, eps=1e-6, **kw)
        self.to_out = Linear(dim, dim, **kw)
        self.attn = LocalAttention(num_heads, self.head_dim)

    def __call__(self, x: Array, context: Array,
                 latent_shape: tuple[int, int, int] | None = None,
                 num_cond_latents: int = 0) -> Array:
        b, n, c = x.shape
        if num_cond_latents > 0 and latent_shape is not None:
            n_cond = num_cond_latents * (n // latent_shape[0])
            x_noise = x[:, n_cond:]
            out_noise = self._attend(x_noise, context)
            return jnp.concatenate(
                [jnp.zeros((b, n_cond, c), out_noise.dtype), out_noise],
                axis=1)
        return self._attend(x, context)

    def _attend(self, x: Array, context: Array) -> Array:
        b, n, c = x.shape
        m = context.shape[1]
        q = self.q_norm(
            self.q_linear(x).reshape(b, n, self.num_heads,
                                     self.head_dim)).astype(x.dtype)
        kv = self.kv_linear(context).reshape(b, m, 2, self.num_heads,
                                             self.head_dim)
        k = self.k_norm(kv[:, :, 0]).astype(x.dtype)
        v = kv[:, :, 1]
        return self.to_out(self.attn(q, k, v).reshape(b, n, c))


class LongCatTransformerBlock(nnx.Module):
    """AdaLN(per-frame) -> self-attn -> cross-attn -> SwiGLU FFN
    (reference :707-869)."""

    def __init__(self, hidden_size: int, num_heads: int, mlp_ratio: float,
                 adaln_tembed_dim: int, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.hidden_size = hidden_size
        self.adaln_linear_1 = Linear(adaln_tembed_dim, 6 * hidden_size, **kw)
        self.norm_attn = FP32LayerNorm(hidden_size, 1e-6, False, **kw)
        self.norm_ffn = FP32LayerNorm(hidden_size, 1e-6, False, **kw)
        self.norm_cross = FP32LayerNorm(hidden_size, 1e-6, True, **kw)
        self.self_attn = LongCatSelfAttention(hidden_size, num_heads, **kw)
        self.cross_attn = LongCatCrossAttention(hidden_size, num_heads, **kw)
        self.ffn = LongCatSwiGLUFFN(hidden_size,
                                    ffn_hidden_dim(hidden_size, mlp_ratio),
                                    **kw)

    @staticmethod
    def _modulate(norm, x, shift, scale, b, t, c):
        xf = x.reshape(b, t, -1, c)
        out = norm(xf).astype(jnp.float32) * (scale + 1.0) + shift
        return out.astype(x.dtype).reshape(b, -1, c)

    def __call__(self, x: Array, context: Array, t_emb: Array,
                 latent_shape: tuple[int, int, int],
                 num_cond_latents: int = 0,
                 kv_cache: tuple[Array, Array] | None = None,
                 skip_crs_attn: bool = False):
        b, n, c = x.shape
        t = latent_shape[0] if kv_cache is None else t_emb.shape[1]
        # fp32 modulation params per latent frame [B, T, 1, C]
        mod = self.adaln_linear_1(jax.nn.silu(
            t_emb.astype(jnp.float32))).astype(jnp.float32)
        (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp,
         gate_mlp) = jnp.split(mod[:, :, None], 6, axis=-1)

        x_norm = self._modulate(self.norm_attn, x, shift_msa, scale_msa, b,
                                t, c)
        kv_new = None
        if kv_cache is not None:
            attn_out = self.self_attn(x_norm, latent_shape,
                                      num_cond_latents, kv_cache)
        else:
            attn_out, kv_new = self.self_attn(x_norm, latent_shape,
                                              num_cond_latents)
        x = (x.astype(jnp.float32) +
             (gate_msa * attn_out.astype(jnp.float32).reshape(
                 b, t, -1, c)).reshape(b, n, c)).astype(x.dtype)

        if not skip_crs_attn:
            cross_num_cond = 0 if kv_cache is not None else num_cond_latents
            x = x + self.cross_attn(self.norm_cross(x).astype(x.dtype),
                                    context, latent_shape, cross_num_cond)

        x_norm = self._modulate(self.norm_ffn, x, shift_mlp, scale_mlp, b, t,
                                c)
        ffn_out = self.ffn(x_norm)
        x = (x.astype(jnp.float32) +
             (gate_mlp * ffn_out.astype(jnp.float32).reshape(
                 b, t, -1, c)).reshape(b, n, c)).astype(x.dtype)
        return x, kv_new


class LongCatFinalLayer(nnx.Module):
    """Per-frame AdaLN output projection (reference :876-936)."""

    def __init__(self, hidden_size: int, out_channels: int,
                 adaln_tembed_dim: int, patch_size: tuple[int, int, int], *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.adaln_linear = Linear(adaln_tembed_dim, 2 * hidden_size, **kw)
        self.norm = FP32LayerNorm(hidden_size, 1e-6, False, **kw)
        np_ = patch_size[0] * patch_size[1] * patch_size[2]
        self.proj = Linear(hidden_size, np_ * out_channels, **kw)

    def __call__(self, x: Array, t_emb: Array, latent_t: int) -> Array:
        b, n, c = x.shape
        mod = self.adaln_linear(jax.nn.silu(
            t_emb.astype(jnp.float32))).astype(jnp.float32)
        shift, scale = jnp.split(mod[:, :, None], 2, axis=-1)
        xf = x.reshape(b, latent_t, -1, c)
        xf = self.norm(xf).astype(jnp.float32) * (scale + 1.0) + shift
        return self.proj(xf.astype(x.dtype).reshape(b, n, c))


class LongCatTransformer3DModel(nnx.Module):
    """Top-level LongCat DiT (reference :943-1146)."""

    def __init__(self, config, *, param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        hidden = config.hidden_size
        self.out_channels = config.out_channels
        ps = tuple(config.patch_size)
        self.patch_size = ps
        # Conv3d patchify as a Linear over flattened patches
        self.patch_embed = _LongCatPatchEmbed(config.in_channels, hidden, ps,
                                              **kw)
        self.time_embedder = LongCatTimestepEmbedder(
            config.frequency_embedding_size, config.adaln_tembed_dim, **kw)
        self.caption_embedder = LongCatCaptionEmbedder(
            config.caption_channels, hidden,
            getattr(config, "text_tokens_zero_pad", True), **kw)
        self.blocks = nnx.List([
            LongCatTransformerBlock(hidden, config.num_attention_heads,
                                    config.mlp_ratio,
                                    config.adaln_tembed_dim, **kw)
            for _ in range(config.depth)
        ])
        self.final_layer = LongCatFinalLayer(hidden, config.out_channels,
                                             config.adaln_tembed_dim, ps,
                                             **kw)

    def __call__(self, hidden_states: Array, encoder_hidden_states,
                 timestep: Array, encoder_attention_mask: Array | None = None,
                 num_cond_latents: int = 0, return_kv: bool = False,
                 kv_cache_list: list | None = None,
                 skip_crs_attn: bool = False, **kwargs):
        cfg = self.config
        b, _, t, h, w = hidden_states.shape
        pt, ph, pw = self.patch_size
        nt, nh, nw = t // pt, h // ph, w // pw

        if isinstance(encoder_hidden_states, (list, tuple)):
            encoder_hidden_states = encoder_hidden_states[0]
        if isinstance(encoder_attention_mask, (list, tuple)):
            encoder_attention_mask = (encoder_attention_mask[0]
                                      if encoder_attention_mask else None)

        x = self.patch_embed(hidden_states)
        # per-frame timesteps [B, T]
        if timestep.ndim == 1:
            timestep = jnp.broadcast_to(timestep[:, None], (b, nt))
        t_emb = self.time_embedder(timestep.reshape(-1)).reshape(b, nt, -1)
        context = self.caption_embedder(
            encoder_hidden_states.astype(x.dtype), encoder_attention_mask)

        kv_out = [] if return_kv else None
        for i, block in enumerate(self.blocks):
            cache = kv_cache_list[i] if kv_cache_list is not None else None
            x, kv = block(x, context, t_emb, (nt, nh, nw),
                          num_cond_latents=num_cond_latents, kv_cache=cache,
                          skip_crs_attn=skip_crs_attn)
            if return_kv:
                kv_out.append(kv)

        out = self.final_layer(x, t_emb, nt)
        # unpatchify [B, N, pt*ph*pw*C] -> [B, C, T, H, W]
        out = out.reshape(b, nt, nh, nw, pt, ph, pw, self.out_channels)
        out = out.transpose(0, 7, 1, 4, 2, 5, 3, 6).reshape(
            b, self.out_channels, nt * pt, nh * ph, nw * pw)
        out = out.astype(jnp.float32)
        if return_kv:
            return out, kv_out
        return out


class _LongCatPatchEmbed(nnx.Module):
    """Conv3d patchify as Linear (reference PatchEmbed3D :29-71)."""

    def __init__(self, in_channels: int, embed_dim: int,
                 patch_size: tuple[int, int, int], *, param_dtype,
                 rngs: nnx.Rngs):
        self.patch_size = patch_size
        pt, ph, pw = patch_size
        self.proj = Linear(in_channels * pt * ph * pw, embed_dim,
                           param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        """x [B, C, T, H, W] -> [B, N, embed_dim]."""
        b, c, t, h, w = x.shape
        pt, ph, pw = self.patch_size
        x = x.reshape(b, c, t // pt, pt, h // ph, ph, w // pw, pw)
        # token order (t, h, w); feature order (c, pt, ph, pw) to match
        # the torch Conv3d kernel layout [out, C, pt, ph, pw]
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        x = x.reshape(b, (t // pt) * (h // ph) * (w // pw), -1)
        return self.proj(x.astype(self.proj.kernel.value.dtype))


EntryClass = LongCatTransformer3DModel
