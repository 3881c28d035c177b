"""Stable Audio Open DiT, TPU-native.

Behavioral reference: /root/reference/fastvideo/models/dits/
stable_audio.py (:31-389): continuous transformer over audio latents
with learned random-Fourier timestep features, partial half-split rotary
self-attention (rot_dim = head_dim // 2), GQA cross-attention to T5
tokens, SwiGLU feed-forward with zero-init branch outputs, a prepended
global conditioning token (global embed + timestep embed), and zero-init
1x1 pre/post residual convs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.attention import LocalAttention
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.norm import FP32LayerNorm

Array = jax.Array


class FourierFeatures(nnx.Module):
    """(reference :31-41); learned random frequencies."""

    def __init__(self, in_features: int, out_features: int, *, param_dtype,
                 rngs: nnx.Rngs):
        self.weight = nnx.Param(
            jax.random.normal(rngs.params(), (out_features // 2, in_features),
                              param_dtype))

    def __call__(self, x: Array) -> Array:
        f = 2 * math.pi * x @ self.weight.value.astype(x.dtype).T
        return jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)


def _stable_audio_rope(seq_len: int, rot_dim: int) -> np.ndarray:
    inv_freq = 1.0 / (10000.0**(np.arange(0, rot_dim, 2, dtype=np.float32) /
                                rot_dim))
    freqs = np.outer(np.arange(seq_len, dtype=np.float32), inv_freq)
    return np.concatenate([freqs, freqs], axis=-1)  # [S, rot_dim]


def _apply_partial_rope(t: Array, freqs: Array) -> Array:
    """t [B, S, H, D]; freqs [S, rot_dim]; halves-swap rotation on the
    leading rot_dim channels (reference :64-79)."""
    rot_dim = freqs.shape[-1]
    tf = t.astype(jnp.float32)
    t_rot, t_unrot = tf[..., :rot_dim], tf[..., rot_dim:]
    x1, x2 = jnp.split(t_rot, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    cos = jnp.cos(freqs)[None, :, None]
    sin = jnp.sin(freqs)[None, :, None]
    t_rot = t_rot * cos + rotated * sin
    return jnp.concatenate([t_rot, t_unrot], axis=-1).astype(t.dtype)


class StableAudioGLU(nnx.Module):
    def __init__(self, dim_in: int, dim_out: int, *, param_dtype,
                 rngs: nnx.Rngs):
        self.proj = Linear(dim_in, dim_out * 2, param_dtype=param_dtype,
                           rngs=rngs)

    def __call__(self, x: Array) -> Array:
        x, gate = jnp.split(self.proj(x), 2, axis=-1)
        return x * jax.nn.silu(gate)


class StableAudioFeedForward(nnx.Module):
    def __init__(self, dim: int, mult: int = 4, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        inner = int(dim * mult)
        self.linear_in = StableAudioGLU(dim, inner, **kw)
        self.linear_out = Linear(inner, dim, **kw)
        self.linear_out.kernel.value = jnp.zeros_like(
            self.linear_out.kernel.value)

    def __call__(self, x: Array) -> Array:
        return self.linear_out(self.linear_in(x))


class StableAudioAttention(nnx.Module):
    """(reference :125-199); fused qkv for self, q + fused kv for cross."""

    def __init__(self, dim: int, dim_heads: int = 64,
                 dim_context: int | None = None, qk_norm: str | None = None,
                 *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.dim_heads = dim_heads
        self.num_heads = dim // dim_heads
        dim_kv = dim_context if dim_context is not None else dim
        self.kv_heads = dim_kv // dim_heads
        self.is_cross = dim_context is not None
        if self.is_cross:
            self.to_q = Linear(dim, dim, bias=False, **kw)
            self.to_kv = Linear(dim_kv, dim_kv * 2, bias=False, **kw)
        else:
            self.to_qkv = Linear(dim, dim * 3, bias=False, **kw)
        self.to_out = Linear(dim, dim, bias=False, **kw)
        self.to_out.kernel.value = jnp.zeros_like(self.to_out.kernel.value)
        if qk_norm == "ln":
            self.q_norm = FP32LayerNorm(dim_heads, 1e-5, True, **kw)
            self.k_norm = FP32LayerNorm(dim_heads, 1e-5, True, **kw)
        else:
            self.q_norm = None
            self.k_norm = None
        self.attn = LocalAttention(self.num_heads, dim_heads)

    def __call__(self, x: Array, context: Array | None = None,
                 rope_freqs: Array | None = None) -> Array:
        b, n, _ = x.shape
        if self.is_cross:
            q = self.to_q(x)
            kv = self.to_kv(context)
            k, v = jnp.split(kv, 2, axis=-1)
            m = context.shape[1]
        else:
            q, k, v = jnp.split(self.to_qkv(x), 3, axis=-1)
            m = n
        q = q.reshape(b, n, self.num_heads, self.dim_heads)
        k = k.reshape(b, m, self.kv_heads, self.dim_heads)
        v = v.reshape(b, m, self.kv_heads, self.dim_heads)
        if self.q_norm is not None:
            q = self.q_norm(q).astype(x.dtype)
            k = self.k_norm(k).astype(x.dtype)
        if rope_freqs is not None:
            q = _apply_partial_rope(q, rope_freqs)
            k = _apply_partial_rope(k, rope_freqs)
        if self.kv_heads != self.num_heads:
            rep = self.num_heads // self.kv_heads
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        out = self.attn(q, k, v)
        return self.to_out(out.reshape(b, n, -1))


class StableAudioTransformerBlock(nnx.Module):
    def __init__(self, dim: int, dim_heads: int, cond_token_dim: int,
                 qk_norm: str | None, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.pre_norm = FP32LayerNorm(dim, 1e-5, True, **kw)
        self.self_attn = StableAudioAttention(dim, dim_heads,
                                              qk_norm=qk_norm, **kw)
        self.cross_attend_norm = FP32LayerNorm(dim, 1e-5, True, **kw)
        self.cross_attn = StableAudioAttention(dim, dim_heads,
                                               dim_context=cond_token_dim,
                                               qk_norm=qk_norm, **kw)
        self.ff_norm = FP32LayerNorm(dim, 1e-5, True, **kw)
        self.ff = StableAudioFeedForward(dim, **kw)

    def __call__(self, x: Array, context: Array,
                 rope_freqs: Array) -> Array:
        x = x + self.self_attn(self.pre_norm(x).astype(x.dtype),
                               rope_freqs=rope_freqs)
        x = x + self.cross_attn(
            self.cross_attend_norm(x).astype(x.dtype), context=context)
        return x + self.ff(self.ff_norm(x).astype(x.dtype))


class _Conv1x1(nnx.Module):
    """Bias-free 1x1 Conv1d, weight in torch layout [out, in, 1]."""

    def __init__(self, channels: int, param_dtype):
        self.weight = nnx.Param(
            jnp.zeros((channels, channels, 1), param_dtype))

    def __call__(self, x: Array) -> Array:
        w = self.weight.value[..., 0].astype(x.dtype)
        return jnp.einsum("oc,bct->bot", w, x)


class _SeqMLP(nnx.Module):
    """Linear -> SiLU -> Linear (checkpoint Sequential indices 0 / 2)."""

    def __init__(self, d_in: int, d_mid: int, d_out: int,
                 bias: bool = True, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.linear_1 = Linear(d_in, d_mid, bias=bias, **kw)
        self.linear_2 = Linear(d_mid, d_out, bias=bias, **kw)

    def __call__(self, x: Array) -> Array:
        return self.linear_2(jax.nn.silu(self.linear_1(x)))


class StableAudioDiT(nnx.Module):
    """(reference :268-386)."""

    def __init__(self, config, *, param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        arch = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        embed_dim = arch.embed_dim
        io = arch.io_channels
        self.io_channels = io
        self.timestep_features = FourierFeatures(1, 256, **kw)
        self.to_timestep_embed = _SeqMLP(256, embed_dim, embed_dim, **kw)
        cond_embed_dim = (arch.cond_token_dim
                          if not arch.project_cond_tokens else embed_dim)
        self.to_cond_embed = _SeqMLP(arch.cond_token_dim, cond_embed_dim,
                                     cond_embed_dim, bias=False, **kw)
        global_embed_dim = (arch.global_cond_dim
                            if not arch.project_global_cond else embed_dim)
        self.to_global_embed = _SeqMLP(arch.global_cond_dim,
                                       global_embed_dim, global_embed_dim,
                                       bias=False, **kw)
        dim_heads = embed_dim // arch.num_attention_heads
        self.dim_heads = dim_heads
        self.project_in = Linear(io, embed_dim, bias=False, **kw)
        self.project_out = Linear(embed_dim, io, bias=False, **kw)
        self.layers = nnx.List([
            StableAudioTransformerBlock(embed_dim, dim_heads, cond_embed_dim,
                                        arch.qk_norm, **kw)
            for _ in range(arch.depth)
        ])
        # zero-init 1x1 residual convs; weight kept in torch Conv1d layout
        # [out, in, 1] so checkpoints assign directly
        self.preprocess_conv = _Conv1x1(io, param_dtype)
        self.postprocess_conv = _Conv1x1(io, param_dtype)

    def __call__(self, x: Array, t: Array, *, cross_attn_cond: Array,
                 global_embed: Array, **kwargs) -> Array:
        """x [B, C, T] audio latents; t [B]."""
        dtype = self.project_in.kernel.value.dtype
        x = x.astype(dtype)
        cross = self.to_cond_embed(cross_attn_cond.astype(dtype))
        glob = self.to_global_embed(global_embed.astype(dtype))
        t_emb = self.to_timestep_embed(
            self.timestep_features(t.astype(dtype)[:, None]))
        glob = glob + t_emb

        x = self.preprocess_conv(x) + x
        h = x.transpose(0, 2, 1)  # [B, T, C]
        h = self.project_in(h)
        h = jnp.concatenate([glob[:, None], h], axis=1)
        rot_dim = max(self.dim_heads // 2, 32)
        freqs = jnp.asarray(_stable_audio_rope(h.shape[1], rot_dim))
        for layer in self.layers:
            h = layer(h, cross, freqs)
        h = self.project_out(h)
        out = h.transpose(0, 2, 1)[:, :, 1:]
        return self.postprocess_conv(out) + out


EntryClass = StableAudioDiT
