"""Z-Image transformer (Lumina-style unified image+text stream), TPU-native.

Behavioral reference: /root/reference/fastvideo/models/dits/zimage.py
(:42-570): sandwich-norm blocks (post-attention RMSNorm before the tanh
gate), 4-param modulation (scale/gate pairs, no shift), GQA-capable
attention with per-head RMS qk norm, 3-axis complex RoPE over explicit
position ids (caption occupies axis-0 slots 1..L; image tokens start at
L+1), separate noise/context refiner stacks, then unified joint blocks.

TPU shape: one static token layout per (latent, caption) shape — the
reference's per-sample variable-length padding reduces, for the
uniform-shape batches this framework generates, to suffix padding to
``seq_multi_of`` with learned pad tokens that PARTICIPATE in attention
(the reference only masks cross-sample length differences, which vanish
for uniform batches). No masks, no dynamic shapes, full MXU tiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.attention import LocalAttention
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.norm import FP32LayerNorm, RMSNorm

Array = jax.Array


def _sinusoidal(t: Array, dim: int, max_period: float) -> Array:
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


@functools.lru_cache(maxsize=64)
def _axis_tables(axis_dim: int, axis_len: int,
                 theta: float) -> tuple[np.ndarray, np.ndarray]:
    freqs = 1.0 / (theta**(np.arange(0, axis_dim, 2, dtype=np.float64) /
                           axis_dim))
    angles = np.outer(np.arange(axis_len, dtype=np.float64), freqs)
    return (np.cos(angles).astype(np.float32),
            np.sin(angles).astype(np.float32))


def zimage_freqs(pos_ids: np.ndarray, axes_dims: tuple[int, ...],
                 axes_lens: tuple[int, ...],
                 theta: float) -> tuple[np.ndarray, np.ndarray]:
    """[S, 3] int position ids -> repeat-interleaved (cos, sin)
    [S, sum(dims)] (reference RopeEmbedder :235-266; complex polar ==
    interleaved pair rotation)."""
    cos_parts, sin_parts = [], []
    for i, (dim, length) in enumerate(zip(axes_dims, axes_lens)):
        cos_t, sin_t = _axis_tables(dim, length, theta)
        cos_parts.append(np.repeat(cos_t[pos_ids[:, i]], 2, axis=-1))
        sin_parts.append(np.repeat(sin_t[pos_ids[:, i]], 2, axis=-1))
    return (np.concatenate(cos_parts, -1), np.concatenate(sin_parts, -1))


def _apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    """Interleaved-pair rotation; x [B, S, H, D], cos/sin [S, D]."""
    xf = x.astype(jnp.float32)
    pairs = xf.reshape(*xf.shape[:-1], -1, 2)
    rot = jnp.stack([-pairs[..., 1], pairs[..., 0]], -1).reshape(xf.shape)
    return (xf * cos[None, :, None] + rot * sin[None, :, None]).astype(
        x.dtype)


class ZImageTimestepEmbedder(nnx.Module):
    """(reference :42-77)."""

    def __init__(self, out_size: int, mid_size: int, freq_size: int,
                 max_period: int, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.freq_size = freq_size
        self.max_period = max_period
        self.linear_1 = Linear(freq_size, mid_size, **kw)
        self.linear_2 = Linear(mid_size, out_size, **kw)

    def __call__(self, t: Array) -> Array:
        emb = _sinusoidal(t, self.freq_size, float(self.max_period))
        emb = emb.astype(self.linear_1.kernel.value.dtype)
        return self.linear_2(jax.nn.silu(self.linear_1(emb)))


class ZImageFeedForward(nnx.Module):
    """SwiGLU w2(silu(w1) * w3) (reference :92-101)."""

    def __init__(self, dim: int, hidden_dim: int, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.w1 = Linear(dim, hidden_dim, bias=False, **kw)
        self.w2 = Linear(hidden_dim, dim, bias=False, **kw)
        self.w3 = Linear(dim, hidden_dim, bias=False, **kw)

    def __call__(self, x: Array) -> Array:
        return self.w2(jax.nn.silu(self.w1(x)) * self.w3(x))


class ZImageAttention(nnx.Module):
    """GQA attention with qk RMS norm + RoPE (reference :111-154)."""

    def __init__(self, dim: int, n_heads: int, n_kv_heads: int,
                 qk_norm: bool = True, eps: float = 1e-5, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.n_heads = n_heads
        self.n_kv_heads = n_kv_heads
        self.head_dim = dim // n_heads
        self.to_q = Linear(dim, n_heads * self.head_dim, bias=False, **kw)
        self.to_k = Linear(dim, n_kv_heads * self.head_dim, bias=False, **kw)
        self.to_v = Linear(dim, n_kv_heads * self.head_dim, bias=False, **kw)
        self.to_out = Linear(n_heads * self.head_dim, dim, bias=False, **kw)
        self.norm_q = RMSNorm(self.head_dim, eps=eps, **kw) if qk_norm \
            else None
        self.norm_k = RMSNorm(self.head_dim, eps=eps, **kw) if qk_norm \
            else None
        self.attn = LocalAttention(n_heads, self.head_dim)

    def __call__(self, x: Array, freqs: tuple[Array, Array]) -> Array:
        b, s, _ = x.shape
        q = self.to_q(x).reshape(b, s, self.n_heads, self.head_dim)
        k = self.to_k(x).reshape(b, s, self.n_kv_heads, self.head_dim)
        v = self.to_v(x).reshape(b, s, self.n_kv_heads, self.head_dim)
        if self.norm_q is not None:
            q = self.norm_q(q).astype(x.dtype)
            k = self.norm_k(k).astype(x.dtype)
        cos, sin = freqs
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        if self.n_kv_heads != self.n_heads:
            rep = self.n_heads // self.n_kv_heads
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        out = self.attn(q, k, v)
        return self.to_out(out.reshape(b, s, -1))


class ZImageTransformerBlock(nnx.Module):
    """Sandwich-norm block with tanh-gated residuals (reference
    :157-216)."""

    def __init__(self, dim: int, n_heads: int, n_kv_heads: int,
                 norm_eps: float, qk_norm: bool, adaln_embed_dim: int,
                 modulation: bool = True, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.modulation = modulation
        self.attention = ZImageAttention(dim, n_heads, n_kv_heads, qk_norm,
                                         norm_eps, **kw)
        self.feed_forward = ZImageFeedForward(dim, int(dim / 3 * 8), **kw)
        self.attention_norm1 = RMSNorm(dim, eps=norm_eps, **kw)
        self.ffn_norm1 = RMSNorm(dim, eps=norm_eps, **kw)
        self.attention_norm2 = RMSNorm(dim, eps=norm_eps, **kw)
        self.ffn_norm2 = RMSNorm(dim, eps=norm_eps, **kw)
        if modulation:
            self.adaLN_modulation = Linear(min(dim, adaln_embed_dim),
                                           4 * dim, **kw)

    def __call__(self, x: Array, freqs: tuple[Array, Array],
                 adaln_input: Array | None = None) -> Array:
        if self.modulation:
            mods = self.adaLN_modulation(adaln_input)[:, None]
            scale_msa, gate_msa, scale_mlp, gate_mlp = jnp.split(mods, 4,
                                                                 axis=2)
            gate_msa = jnp.tanh(gate_msa)
            gate_mlp = jnp.tanh(gate_mlp)
            attn_out = self.attention(
                self.attention_norm1(x).astype(x.dtype) * (1.0 + scale_msa),
                freqs)
            x = x + gate_msa * self.attention_norm2(attn_out).astype(x.dtype)
            ffn_out = self.feed_forward(
                self.ffn_norm1(x).astype(x.dtype) * (1.0 + scale_mlp))
            return x + gate_mlp * self.ffn_norm2(ffn_out).astype(x.dtype)
        attn_out = self.attention(self.attention_norm1(x).astype(x.dtype),
                                  freqs)
        x = x + self.attention_norm2(attn_out).astype(x.dtype)
        return x + self.ffn_norm2(
            self.feed_forward(self.ffn_norm1(x).astype(x.dtype))).astype(
                x.dtype)


class ZImageFinalLayer(nnx.Module):
    """(reference :219-232); scale-only AdaLN."""

    def __init__(self, hidden_size: int, out_dim: int, adaln_embed_dim: int,
                 *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm_final = FP32LayerNorm(hidden_size, 1e-6, False, **kw)
        self.linear = Linear(hidden_size, out_dim, **kw)
        self.adaLN_modulation = Linear(min(hidden_size, adaln_embed_dim),
                                       hidden_size, **kw)

    def __call__(self, x: Array, c: Array) -> Array:
        scale = 1.0 + self.adaLN_modulation(jax.nn.silu(c))
        return self.linear(
            self.norm_final(x).astype(x.dtype) * scale[:, None])


class ZImageTransformer2DModel(nnx.Module):
    """Top-level Z-Image DiT (reference :269-567)."""

    def __init__(self, config, *, param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        arch = config
        dim = arch.dim
        self.out_channels = arch.in_channels
        self.seq_multi_of = arch.seq_multi_of

        ps, fps = arch.all_patch_size[0], arch.all_f_patch_size[0]
        self.patch_size, self.f_patch_size = ps, fps
        self.x_embedder = Linear(fps * ps * ps * arch.in_channels, dim, **kw)
        block_kw = dict(n_heads=arch.n_heads, n_kv_heads=arch.n_kv_heads,
                        norm_eps=arch.norm_eps, qk_norm=arch.qk_norm,
                        adaln_embed_dim=arch.adaln_embed_dim, **kw)
        self.noise_refiner = nnx.List([
            ZImageTransformerBlock(dim, modulation=True, **block_kw)
            for _ in range(arch.n_refiner_layers)
        ])
        self.context_refiner = nnx.List([
            ZImageTransformerBlock(dim, modulation=False, **block_kw)
            for _ in range(arch.n_refiner_layers)
        ])
        self.t_embedder = ZImageTimestepEmbedder(
            min(dim, arch.adaln_embed_dim), arch.timestep_mid_size,
            arch.frequency_embedding_size, arch.max_period, **kw)
        self.cap_norm = RMSNorm(arch.cap_feat_dim, eps=arch.norm_eps, **kw)
        self.cap_linear = Linear(arch.cap_feat_dim, dim, **kw)
        self.x_pad_token = nnx.Param(
            jax.random.normal(rngs.params(), (1, dim), param_dtype) * 0.02)
        self.cap_pad_token = nnx.Param(
            jax.random.normal(rngs.params(), (1, dim), param_dtype) * 0.02)
        self.layers = nnx.List([
            ZImageTransformerBlock(dim, modulation=True, **block_kw)
            for _ in range(arch.n_layers)
        ])
        self.final_layer = ZImageFinalLayer(
            dim, ps * ps * fps * self.out_channels, arch.adaln_embed_dim,
            **kw)

    def _freqs(self, cap_len_padded: int, grid: tuple[int, int, int],
               img_pad: int):
        arch = self.config
        cap_pos = np.zeros((cap_len_padded, 3), np.int64)
        cap_pos[:, 0] = 1 + np.arange(cap_len_padded)
        ft, fh, fw = grid
        img_pos = np.stack(
            np.meshgrid(np.arange(ft), np.arange(fh), np.arange(fw),
                        indexing="ij"), -1).reshape(-1, 3)
        img_pos[:, 0] += cap_len_padded + 1
        if img_pad:
            img_pos = np.concatenate(
                [img_pos, np.zeros((img_pad, 3), np.int64)])
        cap_cos, cap_sin = zimage_freqs(cap_pos, tuple(arch.axes_dims),
                                        tuple(arch.axes_lens),
                                        arch.rope_theta)
        img_cos, img_sin = zimage_freqs(img_pos, tuple(arch.axes_dims),
                                        tuple(arch.axes_lens),
                                        arch.rope_theta)
        return ((jnp.asarray(img_cos), jnp.asarray(img_sin)),
                (jnp.asarray(cap_cos), jnp.asarray(cap_sin)))

    def __call__(self, hidden_states: Array, encoder_hidden_states,
                 timestep: Array, **kwargs) -> Array:
        """hidden_states [B, C, T, H, W] (T=1 for images);
        encoder_hidden_states [B, L, cap_feat_dim]; timestep ALREADY in
        the (1000-t)/1000 convention (the denoising stage transforms it,
        reference zimage stages.py:231-233)."""
        arch = self.config
        if isinstance(encoder_hidden_states, (list, tuple)):
            encoder_hidden_states = encoder_hidden_states[0]
        b, c, t, h, w = hidden_states.shape
        ps, fps = self.patch_size, self.f_patch_size
        ft, fh, fw = t // fps, h // ps, w // ps

        t_emb = self.t_embedder(timestep * arch.t_scale)

        # patchify (token order t-major; feature order (pt, ph, pw, c),
        # reference :433-445)
        x = hidden_states.reshape(b, c, ft, fps, fh, ps, fw, ps)
        x = x.transpose(0, 2, 4, 6, 3, 5, 7, 1).reshape(b, ft * fh * fw, -1)
        img_len = x.shape[1]
        img_pad = (-img_len) % self.seq_multi_of
        x = self.x_embedder(x.astype(self.x_embedder.kernel.value.dtype))
        if img_pad:
            pad_tok = jnp.broadcast_to(
                self.x_pad_token.value.astype(x.dtype)[None],
                (b, img_pad, x.shape[-1]))
            x = jnp.concatenate([x, pad_tok], axis=1)

        cap = encoder_hidden_states.astype(x.dtype)
        cap_len = cap.shape[1]
        cap_pad = (-cap_len) % self.seq_multi_of
        cap = self.cap_linear(self.cap_norm(cap).astype(x.dtype))
        if cap_pad:
            # reference repeats the last caption feature then overwrites
            # the embedded rows with cap_pad_token (:423-424, :541)
            pad_tok = jnp.broadcast_to(
                self.cap_pad_token.value.astype(x.dtype)[None],
                (b, cap_pad, cap.shape[-1]))
            cap = jnp.concatenate([cap, pad_tok], axis=1)

        img_freqs, cap_freqs = self._freqs(cap_len + cap_pad, (ft, fh, fw),
                                           img_pad)
        adaln = t_emb.astype(x.dtype)
        for layer in self.noise_refiner:
            x = layer(x, img_freqs, adaln)
        for layer in self.context_refiner:
            cap = layer(cap, cap_freqs)

        unified = jnp.concatenate([x, cap], axis=1)
        uni_freqs = (jnp.concatenate([img_freqs[0], cap_freqs[0]], 0),
                     jnp.concatenate([img_freqs[1], cap_freqs[1]], 0))
        for layer in self.layers:
            unified = layer(unified, uni_freqs, adaln)

        out = self.final_layer(unified[:, :img_len], adaln)
        out = out.reshape(b, ft, fh, fw, fps, ps, ps, self.out_channels)
        out = out.transpose(0, 7, 1, 4, 2, 5, 3, 6).reshape(
            b, self.out_channels, t, h, w)
        return out


EntryClass = ZImageTransformer2DModel
