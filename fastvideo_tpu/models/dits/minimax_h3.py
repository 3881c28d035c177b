"""MiniMax H3 joint audio-video-text DiT, TPU-native.

Behavioral reference: /root/reference/fastvideo/models/dits/minimax_h3.py
(:31-677): the three modalities are packed into ONE padless document by
caller-provided row indices; every block applies row-indexed AdaLN — the
modulation table has one row per (timestep, modality) pair, gathered per
token by ``timestep_index * 3 + token_tag``. Attention rotates only the
first ``2*3*rope_freq_dim`` head channels (half-split convention) using
3-axis position ids and passes the remaining channels through. A 2-block
RMS-norm token refiner preprocesses the text rows. Outputs are gathered
back out of the packed document per modality.

TPU shape: the packed layout is static per (video, audio, text) shape,
so the index_copy/index_select pairs compile to static gathers; all
matmuls stay dense on the MXU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.attention import DistributedAttention, LocalAttention
from fastvideo_tpu.layers.embeddings import timestep_embedding
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.norm import RMSNorm

Array = jax.Array

MINIMAX_H3_MODALITY_NUM = 3


def minimax_rope(position_ids: Array, rope_freq_dim: int,
                 rope_theta: float) -> tuple[Array, Array]:
    """[S, 3] -> half-split (cos, sin) [S, 2*3*rope_freq_dim]
    (reference :31-51)."""
    inv_freq = 1.0 / (rope_theta**(
        jnp.arange(0, 2 * rope_freq_dim, 2, dtype=jnp.float32) /
        (2 * rope_freq_dim)))
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq
    freqs = jnp.concatenate([freqs[:, 0], freqs[:, 1], freqs[:, 2]], -1)
    freqs = jnp.concatenate([freqs, freqs], -1)
    return jnp.cos(freqs), jnp.sin(freqs)


def _apply_partial_rope(x: Array, cos: Array, sin: Array) -> Array:
    """Half-split rotation on the leading rotary_dim channels
    (reference :176-191). x [B, S, H, D]; cos/sin [S, rotary_dim]."""
    rotary_dim = cos.shape[-1]
    x_rot, x_pass = x[..., :rotary_dim], x[..., rotary_dim:]
    cos_b = cos.astype(x.dtype)[None, :, None]
    sin_b = sin.astype(x.dtype)[None, :, None]
    first, second = jnp.split(x_rot, 2, axis=-1)
    rotated = jnp.concatenate([-second, first], axis=-1)
    x_rot = x_rot * cos_b + rotated * sin_b
    return jnp.concatenate([x_rot, x_pass], axis=-1)


class MiniMaxH3TimestepEmbedding(nnx.Module):
    def __init__(self, input_dim: int, hidden_dim: int, output_dim: int, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.fc_in = Linear(input_dim, hidden_dim, **kw)
        self.fc_out = Linear(hidden_dim, output_dim, **kw)

    def __call__(self, sample: Array) -> Array:
        return self.fc_out(jax.nn.silu(self.fc_in(sample)))


class MiniMaxH3FeedForward(nnx.Module):
    """value-first packed SwiGLU: fc_in -> (value, gate) -> value*silu(gate)
    (reference :87-118)."""

    def __init__(self, hidden_size: int, ffn_dim: int, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.fc_in = Linear(hidden_size, 2 * ffn_dim, bias=False, **kw)
        self.fc_out = Linear(ffn_dim, hidden_size, bias=False, **kw)

    def __call__(self, x: Array) -> Array:
        value, gate = jnp.split(self.fc_in(x), 2, axis=-1)
        return self.fc_out(value * jax.nn.silu(gate))


class MiniMaxH3Attention(nnx.Module):
    """(reference :121-222)."""

    def __init__(self, hidden_size: int, num_heads: int, head_dim: int,
                 qk_norm_eps: float, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.num_heads = num_heads
        self.head_dim = head_dim
        inner = num_heads * head_dim
        self.to_q = Linear(hidden_size, inner, bias=False, **kw)
        self.to_k = Linear(hidden_size, inner, bias=False, **kw)
        self.to_v = Linear(hidden_size, inner, bias=False, **kw)
        self.norm_q = RMSNorm(head_dim, eps=qk_norm_eps, **kw)
        self.norm_k = RMSNorm(head_dim, eps=qk_norm_eps, **kw)
        self.to_out = Linear(inner, hidden_size, bias=False, **kw)
        self.attn = DistributedAttention(num_heads, head_dim)
        self.local_attn = LocalAttention(num_heads, head_dim)

    def __call__(self, x: Array, rotary_emb=None,
                 local: bool = False) -> Array:
        b, s, _ = x.shape
        q = self.to_q(x).reshape(b, s, self.num_heads, self.head_dim)
        k = self.to_k(x).reshape(b, s, self.num_heads, self.head_dim)
        v = self.to_v(x).reshape(b, s, self.num_heads, self.head_dim)
        q = self.norm_q(q).astype(x.dtype)
        k = self.norm_k(k).astype(x.dtype)
        if rotary_emb is not None:
            cos, sin = rotary_emb
            q = _apply_partial_rope(q, cos, sin)
            k = _apply_partial_rope(k, cos, sin)
        out = self.local_attn(q, k, v) if local else self.attn(q, k, v)
        return self.to_out(out.reshape(b, s, -1))


class MiniMaxH3TokenRefinerBlock(nnx.Module):
    """Pre-RMS-norm text refiner block (reference :225-261)."""

    def __init__(self, hidden_size: int, num_heads: int, head_dim: int,
                 ffn_dim: int, norm_eps: float, qk_norm_eps: float, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm1 = RMSNorm(hidden_size, eps=norm_eps, **kw)
        self.attn = MiniMaxH3Attention(hidden_size, num_heads, head_dim,
                                       qk_norm_eps, **kw)
        self.norm2 = RMSNorm(hidden_size, eps=norm_eps, **kw)
        self.ff = MiniMaxH3FeedForward(hidden_size, ffn_dim, **kw)

    def __call__(self, x: Array) -> Array:
        x = x + self.attn(self.norm1(x).astype(x.dtype), None, local=True)
        return x + self.ff(self.norm2(x).astype(x.dtype))


class MiniMaxH3TokenRefiner(nnx.Module):
    def __init__(self, hidden_size: int, num_heads: int, head_dim: int,
                 ffn_dim: int, num_layers: int, norm_eps: float,
                 qk_norm_eps: float, final_norm_eps: float, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.refiner_blocks = nnx.List([
            MiniMaxH3TokenRefinerBlock(hidden_size, num_heads, head_dim,
                                       ffn_dim, norm_eps, qk_norm_eps, **kw)
            for _ in range(num_layers)
        ])
        self.final_norm = RMSNorm(hidden_size, eps=final_norm_eps, **kw)

    def __call__(self, x: Array) -> Array:
        for block in self.refiner_blocks:
            x = block(x)
        return self.final_norm(x).astype(x.dtype)


class MiniMaxH3AdaLayerNormModulation(nnx.Module):
    """6-table modulation per (timestep, modality) pair (reference
    :303-325)."""

    def __init__(self, time_embed_dim: int, hidden_size: int, *,
                 param_dtype, rngs: nnx.Rngs):
        self.hidden_size = hidden_size
        self.linear = Linear(time_embed_dim,
                             6 * hidden_size * MINIMAX_H3_MODALITY_NUM,
                             param_dtype=param_dtype, rngs=rngs)

    def __call__(self, temb: Array):
        out = self.linear(jax.nn.silu(temb).astype(
            self.linear.kernel.value.dtype))
        out = out.reshape(-1, 6 * self.hidden_size)
        return jnp.split(out, 6, axis=-1)


class MiniMaxH3AdaLayerNormOut(nnx.Module):
    """(reference :328-360)."""

    def __init__(self, hidden_size: int, time_embed_dim: int, eps: float, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm = RMSNorm(hidden_size, eps=eps, **kw)
        self.linear = Linear(time_embed_dim, 2 * hidden_size, **kw)

    def __call__(self, x: Array, temb: Array,
                 timestep_indices: Array) -> Array:
        ss = self.linear(jax.nn.silu(temb).astype(
            self.linear.kernel.value.dtype))
        shift, scale = jnp.split(ss, 2, axis=-1)
        x = self.norm(x).astype(x.dtype)
        return x * (1.0 + jnp.take(scale, timestep_indices, axis=0)) + \
            jnp.take(shift, timestep_indices, axis=0)


class MiniMaxH3TransformerBlock(nnx.Module):
    """(reference :363-428)."""

    def __init__(self, hidden_size: int, num_heads: int, head_dim: int,
                 ffn_dim: int, time_embed_dim: int, norm_eps: float,
                 qk_norm_eps: float, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm1 = RMSNorm(hidden_size, eps=norm_eps, **kw)
        self.attn = MiniMaxH3Attention(hidden_size, num_heads, head_dim,
                                       qk_norm_eps, **kw)
        self.norm2 = RMSNorm(hidden_size, eps=norm_eps, **kw)
        self.ff = MiniMaxH3FeedForward(hidden_size, ffn_dim, **kw)
        self.adaln_proj = MiniMaxH3AdaLayerNormModulation(
            time_embed_dim, hidden_size, **kw)

    def __call__(self, x: Array, temb: Array, adaln_indices: Array,
                 rotary_emb) -> Array:
        (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp,
         gate_mlp) = self.adaln_proj(temb)

        def row(t):
            return jnp.take(t, adaln_indices, axis=0).astype(x.dtype)

        h = self.norm1(x).astype(x.dtype) * (1.0 + row(scale_msa)) + \
            row(shift_msa)
        x = x + row(gate_msa) * self.attn(h, rotary_emb)
        h = self.norm2(x).astype(x.dtype) * (1.0 + row(scale_mlp)) + \
            row(shift_mlp)
        return x + row(gate_mlp) * self.ff(h)


class MiniMaxH3Transformer3DModel(nnx.Module):
    """(reference :431-674)."""

    def __init__(self, config, *, param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        arch = config
        self.patch_size = tuple(arch.patch_size)
        video_patch_dim = arch.in_channels * math.prod(arch.patch_size)
        self.proj_in = Linear(video_patch_dim, arch.hidden_size, **kw)
        self.audio_proj_in = Linear(arch.audio_in_channels,
                                    arch.hidden_size, **kw)
        self.context_embedder = Linear(arch.text_dim, arch.hidden_size, **kw)
        self.time_embedder = MiniMaxH3TimestepEmbedding(
            arch.freq_dim, arch.time_embed_hidden_dim, arch.time_embed_dim,
            **kw)
        self.token_refiner = MiniMaxH3TokenRefiner(
            arch.hidden_size, arch.num_attention_heads,
            arch.attention_head_dim, arch.ffn_dim, arch.num_refiner_layers,
            arch.norm_eps, arch.qk_norm_eps, arch.final_norm_eps, **kw)
        self.transformer_blocks = nnx.List([
            MiniMaxH3TransformerBlock(arch.hidden_size,
                                      arch.num_attention_heads,
                                      arch.attention_head_dim, arch.ffn_dim,
                                      arch.time_embed_dim, arch.norm_eps,
                                      arch.qk_norm_eps, **kw)
            for _ in range(arch.num_layers)
        ])
        self.norm_out = MiniMaxH3AdaLayerNormOut(arch.hidden_size,
                                                 arch.time_embed_dim,
                                                 arch.final_norm_eps, **kw)
        self.proj_out = Linear(arch.hidden_size, video_patch_dim, **kw)
        self.audio_proj_out = Linear(arch.hidden_size,
                                     arch.audio_in_channels, **kw)

    def __call__(self, hidden_states: Array, audio_hidden_states: Array,
                 encoder_hidden_states: Array, timestep: Array,
                 timestep_indices: Array, token_tags: Array,
                 position_ids: Array, video_indices: Array,
                 audio_indices: Array, text_indices: Array, **kwargs):
        """One packed document: row indices place each modality's tokens;
        returns (video_rows, audio_rows) velocities."""
        arch = self.config
        seq_len = position_ids.shape[0]
        rotary_emb = minimax_rope(position_ids, arch.rope_freq_dim,
                                  arch.rope_theta)
        dtype = self.proj_in.kernel.value.dtype
        video_embeds = self.proj_in(hidden_states.astype(dtype))
        audio_embeds = self.audio_proj_in(audio_hidden_states.astype(dtype))
        text_embeds = self.context_embedder(
            encoder_hidden_states.astype(dtype))
        text_embeds = self.token_refiner(text_embeds)

        b = text_embeds.shape[0]
        packed = jnp.zeros((b, seq_len, text_embeds.shape[-1]),
                           text_embeds.dtype)
        packed = packed.at[:, text_indices].set(text_embeds)
        packed = packed.at[:, video_indices].set(
            video_embeds.astype(text_embeds.dtype))
        packed = packed.at[:, audio_indices].set(
            audio_embeds.astype(text_embeds.dtype))

        temb = timestep_embedding(timestep.reshape(-1), arch.freq_dim)
        temb = self.time_embedder(temb.astype(dtype))
        adaln_indices = timestep_indices * MINIMAX_H3_MODALITY_NUM + \
            token_tags

        for block in self.transformer_blocks:
            packed = block(packed, temb, adaln_indices, rotary_emb)

        packed = self.norm_out(packed, temb, timestep_indices)
        video_out = self.proj_out(packed.astype(dtype))
        audio_out = self.audio_proj_out(packed.astype(dtype))
        return (video_out[:, video_indices], audio_out[:, audio_indices])


EntryClass = MiniMaxH3Transformer3DModel
