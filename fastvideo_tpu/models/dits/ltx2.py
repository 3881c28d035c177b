"""LTX-2 audio+video joint transformer, TPU-native.

Behavioral reference: /root/reference/fastvideo/models/dits/ltx2.py
(:178-3173): a 48-block audio/video stack where every block runs video
self-attention (3D fractional rope over pixel-second coordinates), text
cross-attention, audio self-attention (1D timing rope), bidirectional
audio<->video cross-attention driven by dedicated AdaLN-single heads,
and gated FFNs — all modulated by PER-TOKEN sigma timesteps through
scale-shift tables. The wrapper patchifies (1, p, p) video latents and
(c f)-flattened audio mel latents, and returns DENOISED predictions
(x - v * sigma), not velocity.

LTX-2.3 gated extensions (cross_attention_adaln, apply_gated_attention,
per-sample STG skip) are carried as config flags; defaults reproduce
LTX-2.0 exactly, matching the reference.

TPU notes: rope (split or interleaved, per checkpoint) is applied to
local tokens BEFORE the Ulysses exchange (it is per-token, so it
commutes with the head/seq redistribution); audio sequences are short
and stay replicated.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.attention.layer import DistributedAttention, LocalAttention
from fastvideo_tpu.configs.models.base import DiTArchConfig, ModelConfig
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.norm import RMSNorm
from fastvideo_tpu.models.dits.sd3 import _ln

Array = jax.Array

LTX2_SCALE_FACTORS = (8, 32, 32)
LTX2_AUDIO_MEL_BINS = 16
LTX2_AUDIO_SAMPLE_RATE = 16000
LTX2_AUDIO_HOP_LENGTH = 160
LTX2_AUDIO_DOWNSAMPLE = 4

# Checkpoints carry an optional model./diffusion_model. prefix (reference
# configs/models/dits/ltx2.py:34-40 nests everything under .model; our
# module tree is flat, so the prefix strips).
LTX2_PARAM_NAMES_MAPPING: dict[str, str] = {
    r"^(?:model\.)?(?:diffusion_model\.)?(.*)\.to_out\.0\.(weight|bias)$":
    r"\1.to_out.\2",
    # FeedForward: torch Sequential [GELUApprox(proj), Dropout, Linear]
    r"^(?:model\.)?(?:diffusion_model\.)?(.*ff)\.net\.0\.proj\.(weight|bias)$":
    r"\1.net_in.proj.\2",
    r"^(?:model\.)?(?:diffusion_model\.)?(.*ff)\.net\.2\.(weight|bias)$":
    r"\1.net_out.\2",
    r"^(?:model\.)?(?:diffusion_model\.)?(.*)$": r"\1",
}


@dataclasses.dataclass
class LTX2ArchConfig(DiTArchConfig):
    num_attention_heads: int = 32
    attention_head_dim: int = 128
    in_channels: int = 128
    out_channels: int = 128
    num_layers: int = 48
    cross_attention_dim: int = 4096
    caption_channels: int = 3840
    norm_eps: float = 1e-6
    positional_embedding_theta: float = 10000.0
    positional_embedding_max_pos: tuple[int, ...] = (20, 2048, 2048)
    timestep_scale_multiplier: int = 1000
    use_middle_indices_grid: bool = True
    rope_type: str = "split"
    patch_size: tuple[int, int, int] = (1, 1, 1)
    audio_num_attention_heads: int = 32
    audio_attention_head_dim: int = 64
    audio_in_channels: int = 128
    audio_out_channels: int = 128
    audio_cross_attention_dim: int = 2048
    audio_positional_embedding_max_pos: tuple[int, ...] = (20,)
    av_ca_timestep_scale_multiplier: int = 1
    cross_attention_adaln: bool = False
    apply_gated_attention: bool = False
    stg_block_idx: int = 29

    @property
    def hidden_size(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def audio_hidden_size(self) -> int:
        return self.audio_num_attention_heads * self.audio_attention_head_dim

    @property
    def num_channels_latents(self) -> int:
        return self.in_channels // math.prod(self.patch_size)

    @property
    def patch_size_thw(self) -> tuple[int, int, int]:
        return tuple(self.patch_size)


@dataclasses.dataclass
class LTX2VideoConfig(ModelConfig):
    arch_config: LTX2ArchConfig = dataclasses.field(
        default_factory=LTX2ArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(LTX2_PARAM_NAMES_MAPPING))


# -- rope ------------------------------------------------------------------


def ltx_freq_grid(theta: float, n_pos: int, inner_dim: int) -> np.ndarray:
    """theta^linspace(0,1, dim/(2*n_pos)) * pi/2 (reference :798-820)."""
    n = inner_dim // (2 * n_pos)
    pow_indices = theta**np.linspace(0.0, 1.0, n, dtype=np.float64)
    return (pow_indices * math.pi / 2).astype(np.float32)


def ltx_freqs(indices_grid: Array, max_pos: tuple[int, ...], theta: float,
              inner_dim: int, use_middle: bool) -> Array:
    """indices_grid [B, n_pos, S, 2] bounds -> freqs [B, S, n_pos * n]
    (reference _ltx_generate_freqs)."""
    if use_middle:
        grid = (indices_grid[..., 0] + indices_grid[..., 1]) / 2.0
    else:
        grid = indices_grid[..., 0]
    n_pos = grid.shape[1]
    frac = jnp.stack(
        [grid[:, i] / max_pos[i] for i in range(n_pos)], axis=-1)
    indices = jnp.asarray(ltx_freq_grid(theta, n_pos, inner_dim))
    # [B, S, n_pos, n] -> transpose freq-major -> flatten
    f = indices[None, None, None, :] * (frac[..., None] * 2 - 1)
    return f.transpose(0, 1, 3, 2).reshape(f.shape[0], f.shape[1], -1)


def ltx_freqs_cis(indices_grid: Array, dim: int, theta: float,
                  max_pos: tuple[int, ...], use_middle: bool,
                  num_heads: int, rope_type: str):
    """(cos, sin) tables (reference precompute_ltx_freqs_cis)."""
    freqs = ltx_freqs(indices_grid, max_pos, theta, dim, use_middle)
    if rope_type == "split":
        pad = dim // 2 - freqs.shape[-1]
        cos, sin = jnp.cos(freqs), jnp.sin(freqs)
        if pad:
            b, s = cos.shape[:2]
            cos = jnp.concatenate([jnp.ones((b, s, pad), cos.dtype), cos],
                                  axis=-1)
            sin = jnp.concatenate([jnp.zeros((b, s, pad), sin.dtype), sin],
                                  axis=-1)
        b, s = cos.shape[:2]
        cos = cos.reshape(b, s, num_heads, -1)
        sin = sin.reshape(b, s, num_heads, -1)
        return cos, sin  # [B, S, H, d_head/2]
    # interleaved
    n_elem = 2 * indices_grid.shape[1]
    pad = dim % n_elem
    cos = jnp.repeat(jnp.cos(freqs), 2, axis=-1)
    sin = jnp.repeat(jnp.sin(freqs), 2, axis=-1)
    if pad:
        b, s = cos.shape[:2]
        cos = jnp.concatenate([jnp.ones((b, s, pad), cos.dtype), cos],
                              axis=-1)
        sin = jnp.concatenate([jnp.zeros((b, s, pad), sin.dtype), sin],
                              axis=-1)
    return cos, sin  # [B, S, inner_dim]


def apply_ltx_rope(x: Array, freqs_cis, rope_type: str) -> Array:
    """x [B, S, H, D] (reference apply_ltx_rotary_emb)."""
    cos, sin = freqs_cis
    xf = x.astype(jnp.float32)
    if rope_type == "split":
        # pairs are (x[i], x[i + D/2]); cos/sin [B, S, H, D/2]
        d2 = xf.shape[-1] // 2
        x1, x2 = xf[..., :d2], xf[..., d2:]
        cosf = cos.astype(jnp.float32)
        sinf = sin.astype(jnp.float32)
        o1 = x1 * cosf - x2 * sinf
        o2 = x2 * cosf + x1 * sinf
        return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)
    # interleaved: pairs (x[2i], x[2i+1]); cos/sin [B, S, inner] -> heads
    b, s, h, d = x.shape
    cosf = cos.reshape(b, s, h, d).astype(jnp.float32)
    sinf = sin.reshape(b, s, h, d).astype(jnp.float32)
    x2 = xf.reshape(*xf.shape[:-1], -1, 2)
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(xf.shape)
    return (xf * cosf + rot * sinf).astype(x.dtype)


# -- embeddings ------------------------------------------------------------


def _ltx_timestep_embedding(t: Array, dim: int) -> Array:
    """[sin | cos] with downscale_freq_shift=0 and flip (reference
    get_timestep_embedding + Timesteps(flip_sin_to_cos=True))."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class LTXTimestepEmbedding(nnx.Module):
    def __init__(self, in_channels: int, dim: int, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.linear_1 = Linear(in_channels, dim, **kw)
        self.linear_2 = Linear(dim, dim, **kw)

    def __call__(self, x: Array) -> Array:
        return self.linear_2(jax.nn.silu(self.linear_1(x)))


class AdaLayerNormSingle(nnx.Module):
    """(reference :271-297): sinusoid(256) -> MLP -> silu -> linear to
    coeff * dim; returns (mods, embedded_timestep)."""

    def __init__(self, dim: int, coefficient: int = 6, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.emb = _EmbWrap(dim, **kw)
        self.linear = Linear(dim, coefficient * dim, **kw)

    def __call__(self, timestep: Array, dtype) -> tuple[Array, Array]:
        embedded = self.emb(timestep, dtype)
        return self.linear(jax.nn.silu(embedded)), embedded


class _EmbWrap(nnx.Module):
    """PixArtAlphaCombinedTimestepSizeEmbeddings (reference :257-268)."""

    def __init__(self, dim: int, *, param_dtype, rngs: nnx.Rngs):
        self.timestep_embedder = LTXTimestepEmbedding(
            256, dim, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, timestep: Array, dtype) -> Array:
        proj = _ltx_timestep_embedding(timestep, 256).astype(dtype)
        return self.timestep_embedder(proj)


class PixArtAlphaTextProjection(nnx.Module):
    def __init__(self, in_features: int, hidden: int, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.linear_1 = Linear(in_features, hidden, **kw)
        self.linear_2 = Linear(hidden, hidden, **kw)

    def __call__(self, x: Array) -> Array:
        return self.linear_2(jax.nn.gelu(self.linear_1(x),
                                         approximate=True))


class _GELUProj(nnx.Module):
    def __init__(self, dim_in: int, dim_out: int, *, param_dtype,
                 rngs: nnx.Rngs):
        self.proj = Linear(dim_in, dim_out, param_dtype=param_dtype,
                           rngs=rngs)


class LTXFeedForward(nnx.Module):
    """GELUApprox proj (4x) -> Linear (reference FeedForward :347-378;
    checkpoint names net.0.proj / net.2 map via the param table)."""

    def __init__(self, dim: int, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.net_in = _GELUProj(dim, dim * 4, **kw)
        self.net_out = Linear(dim * 4, dim, **kw)

    def __call__(self, x: Array) -> Array:
        return self.net_out(jax.nn.gelu(self.net_in.proj(x),
                                        approximate=True))


class LTXSelfAttention(nnx.Module):
    """q/k RMS-norm over the FULL inner dim, biased projections, LTX rope
    (reference :1477-1663). Self-attention (context=None) is seq-shardable;
    cross variants stay local."""

    def __init__(self, query_dim: int, context_dim: int | None, heads: int,
                 dim_head: int, norm_eps: float, rope_type: str,
                 distributed: bool, apply_gated_attention: bool = False, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        inner = heads * dim_head
        ctx_dim = query_dim if context_dim is None else context_dim
        self.heads, self.dim_head = heads, dim_head
        self.rope_type = rope_type
        self.q_norm = RMSNorm(inner, eps=norm_eps, **kw)
        self.k_norm = RMSNorm(inner, eps=norm_eps, **kw)
        self.to_q = Linear(query_dim, inner, **kw)
        self.to_k = Linear(ctx_dim, inner, **kw)
        self.to_v = Linear(ctx_dim, inner, **kw)
        self.to_gate_logits = (Linear(query_dim, heads, **kw)
                               if apply_gated_attention else None)
        self.to_out = Linear(inner, query_dim, **kw)
        self.attn = (DistributedAttention(heads, dim_head)
                     if distributed else LocalAttention(heads, dim_head))

    def _h(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.heads, self.dim_head)

    def __call__(self, x: Array, context: Array | None = None,
                 pe=None, k_pe=None) -> Array:
        src = x if context is None else context
        b, s, _ = x.shape
        q = self.q_norm(self.to_q(x)).astype(x.dtype)
        k = self.k_norm(self.to_k(src)).astype(x.dtype)
        v = self._h(self.to_v(src))
        q = self._h(q)
        k = self._h(k)
        if pe is not None:
            q = apply_ltx_rope(q, pe, self.rope_type)
        if k_pe is not None:
            k = apply_ltx_rope(k, k_pe, self.rope_type)
        elif pe is not None and context is None:
            k = apply_ltx_rope(k, pe, self.rope_type)
        out = self.attn(q, k, v)
        if self.to_gate_logits is not None:
            gates = 2.0 * jax.nn.sigmoid(self.to_gate_logits(x))
            out = out * gates[..., None].astype(out.dtype)
        return self.to_out(out.reshape(b, s, -1))


def _ada(table: Array, timestep: Array, idx: slice) -> tuple[Array, ...]:
    """scale_shift_table[idx] + timestep rows (reference get_ada_values);
    timestep [B, S, n*dim] -> tuple of [B, S, dim] fp32 values."""
    n = table.shape[0]
    b, s = timestep.shape[:2]
    vals = (table[idx][None, None].astype(jnp.float32) +
            timestep.reshape(b, s, n, -1).astype(jnp.float32)[:, :, idx])
    return tuple(vals[:, :, i] for i in range(vals.shape[2]))


class BasicAVTransformerBlock(nnx.Module):
    """(reference :1829-2362)."""

    def __init__(self, video_dim: int, video_heads: int, video_dhead: int,
                 cross_attention_dim: int, audio_dim: int, audio_heads: int,
                 audio_dhead: int, audio_cross_attention_dim: int,
                 norm_eps: float, rope_type: str, distributed: bool,
                 cross_attention_adaln: bool, apply_gated_attention: bool, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm_eps = norm_eps
        self.cross_attention_adaln = cross_attention_adaln
        sst = 9 if cross_attention_adaln else 6
        attn_kw = dict(norm_eps=norm_eps, rope_type=rope_type,
                       apply_gated_attention=apply_gated_attention, **kw)
        self.attn1 = LTXSelfAttention(video_dim, None, video_heads,
                                      video_dhead, distributed=distributed,
                                      **attn_kw)
        self.attn2 = LTXSelfAttention(video_dim, cross_attention_dim,
                                      video_heads, video_dhead,
                                      distributed=False, **attn_kw)
        self.ff = LTXFeedForward(video_dim, **kw)
        self.scale_shift_table = nnx.Param(
            jax.random.normal(rngs.params(), (sst, video_dim),
                              param_dtype) * 0.02)
        self.audio_attn1 = LTXSelfAttention(audio_dim, None, audio_heads,
                                            audio_dhead, distributed=False,
                                            **attn_kw)
        self.audio_attn2 = LTXSelfAttention(audio_dim,
                                            audio_cross_attention_dim,
                                            audio_heads, audio_dhead,
                                            distributed=False, **attn_kw)
        self.audio_ff = LTXFeedForward(audio_dim, **kw)
        self.audio_scale_shift_table = nnx.Param(
            jax.random.normal(rngs.params(), (sst, audio_dim),
                              param_dtype) * 0.02)
        self.audio_to_video_attn = LTXSelfAttention(
            video_dim, audio_dim, audio_heads, audio_dhead,
            distributed=False, **attn_kw)
        self.video_to_audio_attn = LTXSelfAttention(
            audio_dim, video_dim, audio_heads, audio_dhead,
            distributed=False, **attn_kw)
        self.scale_shift_table_a2v_ca_audio = nnx.Param(
            jax.random.normal(rngs.params(), (5, audio_dim),
                              param_dtype) * 0.02)
        self.scale_shift_table_a2v_ca_video = nnx.Param(
            jax.random.normal(rngs.params(), (5, video_dim),
                              param_dtype) * 0.02)
        if cross_attention_adaln:
            self.prompt_scale_shift_table = nnx.Param(
                jax.random.normal(rngs.params(), (2, video_dim),
                                  param_dtype) * 0.02)
            self.audio_prompt_scale_shift_table = nnx.Param(
                jax.random.normal(rngs.params(), (2, audio_dim),
                                  param_dtype) * 0.02)

    def _rms(self, x: Array) -> Array:
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + self.norm_eps)).astype(x.dtype)

    def _text_cross(self, x, context, attn, table, prompt_table, timestep,
                    prompt_timestep):
        if self.cross_attention_adaln:
            shift_q, scale_q, gate = _ada(table.value, timestep,
                                          slice(6, 9))
            bsz = x.shape[0]
            pt = prompt_timestep
            kv = (prompt_table.value[None, None].astype(jnp.float32) +
                  pt.reshape(bsz, pt.shape[1], 2, -1).astype(jnp.float32))
            shift_kv, scale_kv = kv[:, :, 0], kv[:, :, 1]
            attn_in = (self._rms(x).astype(jnp.float32) * (1 + scale_q) +
                       shift_q).astype(x.dtype)
            ctx = (context.astype(jnp.float32) * (1 + scale_kv) +
                   shift_kv).astype(context.dtype)
            return (attn(attn_in, context=ctx).astype(jnp.float32) *
                    gate).astype(x.dtype)
        return attn(self._rms(x), context=context)

    def __call__(self, vx, ax, video_args, audio_args,
                 skip_cross_modal_attn: bool = False):
        va, aa = video_args, audio_args

        sh, sc, g = _ada(self.scale_shift_table.value, va["timesteps"],
                         slice(0, 3))
        norm_vx = (self._rms(vx).astype(jnp.float32) * (1 + sc) +
                   sh).astype(vx.dtype)
        vx = vx + (self.attn1(norm_vx, pe=va["pe"]).astype(jnp.float32) *
                   g).astype(vx.dtype)
        vx = vx + self._text_cross(
            vx, va["context"], self.attn2, self.scale_shift_table,
            getattr(self, "prompt_scale_shift_table", None),
            va["timesteps"], va.get("prompt_timestep"))

        ash, asc, ag = _ada(self.audio_scale_shift_table.value,
                            aa["timesteps"], slice(0, 3))
        norm_ax = (self._rms(ax).astype(jnp.float32) * (1 + asc) +
                   ash).astype(ax.dtype)
        ax = ax + (self.audio_attn1(norm_ax, pe=aa["pe"])
                   .astype(jnp.float32) * ag).astype(ax.dtype)
        ax = ax + self._text_cross(
            ax, aa["context"], self.audio_attn2,
            self.audio_scale_shift_table,
            getattr(self, "audio_prompt_scale_shift_table", None),
            aa["timesteps"], aa.get("prompt_timestep"))

        if not skip_cross_modal_attn:
            vx_n3 = self._rms(vx)
            ax_n3 = self._rms(ax)
            a_ss = _ada(self.scale_shift_table_a2v_ca_audio.value[:4],
                        aa["cross_ss_timestep"], slice(None))
            (a_gate_v2a,) = _ada(
                self.scale_shift_table_a2v_ca_audio.value[4:],
                aa["cross_gate_timestep"], slice(None))
            v_ss = _ada(self.scale_shift_table_a2v_ca_video.value[:4],
                        va["cross_ss_timestep"], slice(None))
            (v_gate_a2v,) = _ada(
                self.scale_shift_table_a2v_ca_video.value[4:],
                va["cross_gate_timestep"], slice(None))
            (scale_a_a2v, shift_a_a2v, scale_a_v2a, shift_a_v2a) = a_ss
            (scale_v_a2v, shift_v_a2v, scale_v_v2a, shift_v_v2a) = v_ss

            vx_scaled = (vx_n3.astype(jnp.float32) * (1 + scale_v_a2v) +
                         shift_v_a2v).astype(vx.dtype)
            ax_scaled = (ax_n3.astype(jnp.float32) * (1 + scale_a_a2v) +
                         shift_a_a2v).astype(ax.dtype)
            vx = vx + (self.audio_to_video_attn(
                vx_scaled, context=ax_scaled, pe=va["cross_pe"],
                k_pe=aa["cross_pe"]).astype(jnp.float32) *
                v_gate_a2v).astype(vx.dtype)

            ax_scaled = (ax_n3.astype(jnp.float32) * (1 + scale_a_v2a) +
                         shift_a_v2a).astype(ax.dtype)
            vx_scaled = (vx_n3.astype(jnp.float32) * (1 + scale_v_v2a) +
                         shift_v_v2a).astype(vx.dtype)
            ax = ax + (self.video_to_audio_attn(
                ax_scaled, context=vx_scaled, pe=aa["cross_pe"],
                k_pe=va["cross_pe"]).astype(jnp.float32) *
                a_gate_v2a).astype(ax.dtype)

        sh, sc, g = _ada(self.scale_shift_table.value, va["timesteps"],
                         slice(3, 6))
        h = (self._rms(vx).astype(jnp.float32) * (1 + sc) +
             sh).astype(vx.dtype)
        vx = vx + (self.ff(h).astype(jnp.float32) * g).astype(vx.dtype)

        ash, asc, ag = _ada(self.audio_scale_shift_table.value,
                            aa["timesteps"], slice(3, 6))
        h = (self._rms(ax).astype(jnp.float32) * (1 + asc) +
             ash).astype(ax.dtype)
        ax = ax + (self.audio_ff(h).astype(jnp.float32) * ag).astype(
            ax.dtype)
        return vx, ax


class LTX2Transformer3DModel(nnx.Module):
    """Top-level AV model + patchify wrapper (reference :2410-3173)."""

    def __init__(self, config: LTX2ArchConfig, *,
                 param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        inner = config.hidden_size
        a_inner = config.audio_hidden_size
        coeff = 9 if config.cross_attention_adaln else 6
        self.patchify_proj = Linear(config.in_channels, inner, **kw)
        self.adaln_single = AdaLayerNormSingle(inner, coeff, **kw)
        self.caption_projection = PixArtAlphaTextProjection(
            config.caption_channels, inner, **kw)
        self.scale_shift_table = nnx.Param(
            jax.random.normal(rngs.params(), (2, inner), param_dtype) *
            0.02)
        self.proj_out = Linear(inner, config.out_channels, **kw)

        self.audio_patchify_proj = Linear(config.audio_in_channels,
                                          a_inner, **kw)
        self.audio_adaln_single = AdaLayerNormSingle(a_inner, coeff, **kw)
        self.audio_caption_projection = PixArtAlphaTextProjection(
            config.caption_channels, a_inner, **kw)
        self.audio_scale_shift_table = nnx.Param(
            jax.random.normal(rngs.params(), (2, a_inner), param_dtype) *
            0.02)
        self.audio_proj_out = Linear(a_inner, config.audio_out_channels,
                                     **kw)

        self.av_ca_video_scale_shift_adaln_single = AdaLayerNormSingle(
            inner, 4, **kw)
        self.av_ca_audio_scale_shift_adaln_single = AdaLayerNormSingle(
            a_inner, 4, **kw)
        self.av_ca_a2v_gate_adaln_single = AdaLayerNormSingle(inner, 1,
                                                              **kw)
        self.av_ca_v2a_gate_adaln_single = AdaLayerNormSingle(a_inner, 1,
                                                              **kw)
        if config.cross_attention_adaln:
            self.prompt_adaln_single = AdaLayerNormSingle(inner, 2, **kw)
            self.audio_prompt_adaln_single = AdaLayerNormSingle(a_inner, 2,
                                                                **kw)

        self.transformer_blocks = nnx.List([
            BasicAVTransformerBlock(
                inner, config.num_attention_heads,
                config.attention_head_dim, config.cross_attention_dim,
                a_inner, config.audio_num_attention_heads,
                config.audio_attention_head_dim,
                config.audio_cross_attention_dim, config.norm_eps,
                config.rope_type, distributed=True,
                cross_attention_adaln=config.cross_attention_adaln,
                apply_gated_attention=config.apply_gated_attention, **kw)
            for _ in range(config.num_layers)
        ])
        self.out_channels = config.out_channels
        self.gradient_checkpointing = False

    # -- position helpers --------------------------------------------------

    def _video_positions(self, b: int, t: int, h: int, w: int,
                         fps: float | None) -> Array:
        """Pixel-second patch bounds (reference get_patch_grid_bounds +
        _get_pixel_coords with causal fix)."""
        pt, ph, pw = self.config.patch_size
        grids = jnp.meshgrid(jnp.arange(0, t, pt), jnp.arange(0, h, ph),
                             jnp.arange(0, w, pw), indexing="ij")
        starts = jnp.stack([g.reshape(-1) for g in grids]).astype(
            jnp.float32)  # [3, S]
        ends = starts + jnp.asarray([[pt], [ph], [pw]], jnp.float32)
        coords = jnp.stack([starts, ends], axis=-1)  # [3, S, 2]
        scale = jnp.asarray(LTX2_SCALE_FACTORS, jnp.float32)[:, None, None]
        coords = coords * scale
        t_fixed = jnp.clip(coords[0] + 1 - LTX2_SCALE_FACTORS[0], 0)
        if fps:
            t_fixed = t_fixed / fps
        coords = coords.at[0].set(t_fixed)
        return jnp.broadcast_to(coords[None], (b, *coords.shape))

    @staticmethod
    def _audio_positions(b: int, frames: int) -> Array:
        """Audio latent timing bounds in seconds (reference
        AudioLatentPatchifier.get_patch_grid_bounds, causal)."""
        def timing(start, end):
            lat = jnp.arange(start, end, dtype=jnp.float32)
            mel = jnp.clip(lat * LTX2_AUDIO_DOWNSAMPLE + 1 -
                           LTX2_AUDIO_DOWNSAMPLE, 0)
            return mel * LTX2_AUDIO_HOP_LENGTH / LTX2_AUDIO_SAMPLE_RATE

        start = timing(0, frames)
        end = timing(1, frames + 1)
        coords = jnp.stack([start, end], axis=-1)[None]  # [1, S, 2]
        return jnp.broadcast_to(coords[None], (b, 1, frames, 2))

    def _prepare(self, x_tokens: Array, timesteps: Array, context: Array,
                 positions: Array, inner: int, heads: int,
                 max_pos: tuple[int, ...], patchify: Linear,
                 adaln: AdaLayerNormSingle, caption_proj, prompt_adaln,
                 sigma: Array | None, cross_ss_adaln, cross_gate_adaln,
                 cross_pe_max: int) -> dict:
        cfg = self.config
        b = x_tokens.shape[0]
        x = patchify(x_tokens)
        ts = timesteps * cfg.timestep_scale_multiplier
        mods, embedded = adaln(ts.reshape(-1), x.dtype)
        mods = mods.reshape(b, -1, mods.shape[-1])
        embedded = embedded.reshape(b, -1, embedded.shape[-1])
        ctx = caption_proj(context.astype(x.dtype))
        pe = ltx_freqs_cis(positions, inner, cfg.positional_embedding_theta,
                           max_pos, cfg.use_middle_indices_grid, heads,
                           cfg.rope_type)
        cross_pe = ltx_freqs_cis(
            positions[:, 0:1], cfg.audio_cross_attention_dim,
            cfg.positional_embedding_theta, (cross_pe_max,), True, heads,
            cfg.rope_type)
        ss_mods, _ = cross_ss_adaln(ts.reshape(-1), x.dtype)
        gate_factor = (cfg.av_ca_timestep_scale_multiplier /
                       cfg.timestep_scale_multiplier)
        gate_mods, _ = cross_gate_adaln(ts.reshape(-1) * gate_factor,
                                        x.dtype)
        args = {
            "timesteps": mods,
            "embedded": embedded,
            "context": ctx,
            "pe": pe,
            "cross_pe": cross_pe,
            "cross_ss_timestep": ss_mods.reshape(b, -1, ss_mods.shape[-1]),
            "cross_gate_timestep": gate_mods.reshape(b, -1,
                                                     gate_mods.shape[-1]),
        }
        if prompt_adaln is not None and sigma is not None:
            pts = sigma * cfg.timestep_scale_multiplier
            pmods, _ = prompt_adaln(pts.reshape(-1), x.dtype)
            args["prompt_timestep"] = pmods.reshape(b, -1, pmods.shape[-1])
        return x, args

    def __call__(self, hidden_states: Array, encoder_hidden_states,
                 timestep: Array,
                 audio_hidden_states: Array | None = None,
                 audio_encoder_hidden_states: Array | None = None,
                 audio_timestep: Array | None = None,
                 video_sigma: Array | None = None,
                 audio_sigma: Array | None = None,
                 fps: float | None = None,
                 skip_cross_modal_attn: bool = False, **kwargs):
        """hidden_states [B, C, T, H, W]; audio_hidden_states
        [B, C_a, T_a, mel]; timesteps are per-sample [B] or per-token
        [B, S] SIGMAS in [0, 1]. Returns denoised (x - v * sigma)
        predictions: video alone, or (video, audio)."""
        cfg = self.config
        if isinstance(encoder_hidden_states, (list, tuple)):
            encoder_hidden_states = encoder_hidden_states[0]
        b, c, t, h, w = hidden_states.shape
        pt, ph, pw = cfg.patch_size
        # patchify: b c (f p1) (h p2) (w p3) -> b (f h w) (c p1 p2 p3)
        xt = hidden_states.reshape(b, c, t // pt, pt, h // ph, ph, w // pw,
                                   pw)
        xt = xt.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        tokens = xt.reshape(b, (t // pt) * (h // ph) * (w // pw), -1)

        if timestep.ndim == 1:
            timestep = timestep[:, None]
        if video_sigma is None:
            video_sigma = timestep[:, 0]
        positions = self._video_positions(b, t, h, w, fps)
        cross_pe_max = max(cfg.positional_embedding_max_pos[0],
                           cfg.audio_positional_embedding_max_pos[0])
        vx, video_args = self._prepare(
            tokens, timestep, encoder_hidden_states, positions,
            cfg.hidden_size, cfg.num_attention_heads,
            tuple(cfg.positional_embedding_max_pos), self.patchify_proj,
            self.adaln_single, self.caption_projection,
            getattr(self, "prompt_adaln_single", None), video_sigma,
            self.av_ca_video_scale_shift_adaln_single,
            self.av_ca_a2v_gate_adaln_single, cross_pe_max)

        run_audio = (audio_hidden_states is not None
                     and audio_encoder_hidden_states is not None)
        if run_audio:
            ab, ac, at, amel = audio_hidden_states.shape
            a_tokens = audio_hidden_states.transpose(0, 2, 1, 3).reshape(
                ab, at, ac * amel)
            if audio_timestep is None:
                audio_timestep = timestep[:, :1]
            if audio_timestep.ndim == 1:
                audio_timestep = audio_timestep[:, None]
            if audio_sigma is None:
                audio_sigma = audio_timestep[:, 0]
            a_positions = self._audio_positions(ab, at)
            ax, audio_args = self._prepare(
                a_tokens, audio_timestep, audio_encoder_hidden_states,
                a_positions, cfg.audio_hidden_size,
                cfg.audio_num_attention_heads,
                tuple(cfg.audio_positional_embedding_max_pos),
                self.audio_patchify_proj, self.audio_adaln_single,
                self.audio_caption_projection,
                getattr(self, "audio_prompt_adaln_single", None),
                audio_sigma, self.av_ca_audio_scale_shift_adaln_single,
                self.av_ca_v2a_gate_adaln_single, cross_pe_max)
        else:
            # zero-length audio stream keeps one jitted program shape-free
            # of optionals is not possible; run a 1-token silent stream
            ax = jnp.zeros((b, 1, cfg.audio_hidden_size),
                           vx.dtype)
            audio_args = None

        if audio_args is None:
            # video-only: reuse the block math with cross-modal skipped
            dummy_t = jnp.zeros((b, 1), jnp.float32)
            _, audio_args = self._prepare(
                jnp.zeros((b, 1, cfg.audio_in_channels), vx.dtype),
                dummy_t, encoder_hidden_states[:, :1],
                self._audio_positions(b, 1), cfg.audio_hidden_size,
                cfg.audio_num_attention_heads,
                tuple(cfg.audio_positional_embedding_max_pos),
                self.audio_patchify_proj, self.audio_adaln_single,
                self.audio_caption_projection,
                getattr(self, "audio_prompt_adaln_single", None), None,
                self.av_ca_audio_scale_shift_adaln_single,
                self.av_ca_v2a_gate_adaln_single, cross_pe_max)
            skip_cross_modal_attn = True

        for block in self.transformer_blocks:
            if self.gradient_checkpointing:
                vx, ax = jax.checkpoint(
                    lambda v, a, blk=block: blk(v, a, video_args,
                                                audio_args,
                                                skip_cross_modal_attn))(
                                                    vx, ax)
            else:
                vx, ax = block(vx, ax, video_args, audio_args,
                               skip_cross_modal_attn)

        def out_proj(x, table, embedded, proj):
            ss = (table[None, None].astype(jnp.float32) +
                  embedded[:, :, None].astype(jnp.float32))
            shift, scale = ss[:, :, 0], ss[:, :, 1]
            x = (_ln(x, self.config.norm_eps) * (1 + scale) +
                 shift).astype(x.dtype)
            return proj(x)

        v_out = out_proj(vx, self.scale_shift_table.value,
                         video_args["embedded"], self.proj_out)
        # denoised = x - v * sigma (reference _to_denoised; sigma is the
        # per-token timestep)
        sig = timestep.astype(jnp.float32)
        if sig.shape[1] == 1:
            sig = jnp.broadcast_to(sig, (b, tokens.shape[1]))
        v_out = (tokens.astype(jnp.float32) -
                 v_out.astype(jnp.float32) * sig[..., None])
        # unpatchify b (f h w) (c p q) -> b c f (h p) (w q)
        v_out = v_out.reshape(b, t // pt, h // ph, w // pw, c, pt, ph, pw)
        v_out = v_out.transpose(0, 4, 1, 5, 2, 6, 3, 7)
        v_out = v_out.reshape(b, c, t, h, w).astype(hidden_states.dtype)

        if not run_audio:
            return v_out

        a_out = out_proj(ax, self.audio_scale_shift_table.value,
                         audio_args["embedded"], self.audio_proj_out)
        a_sig = audio_timestep.astype(jnp.float32)
        if a_sig.shape[1] == 1:
            a_sig = jnp.broadcast_to(a_sig, (ab, at))
        a_out = (a_tokens.astype(jnp.float32) -
                 a_out.astype(jnp.float32) * a_sig[..., None])
        a_out = a_out.reshape(ab, at, ac, amel).transpose(0, 2, 1, 3)
        return v_out, a_out.astype(audio_hidden_states.dtype)


EntryClass = LTX2Transformer3DModel
