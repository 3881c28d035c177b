"""FLUX.2 packed-latent image transformer, TPU-native.

Behavioral reference: /root/reference/fastvideo/models/dits/flux_2.py
(:109-1094): shared (not per-block) adaLN modulation produced once per
step, SwiGLU feedforwards with the gate projection fused into linear_in,
double-stream joint blocks (text-first concat) and parallel single-stream
blocks (fused qkv+mlp input / attn+mlp output projections, ViT-22B style),
4-axis RoPE (theta 2000, 32 dims per axis) that rotates text tokens on
the 4th axis, AdaLN-continuous output head. All projections are bias-free.

TPU design notes: streams stay split (image seq-sharded over ``sp``, text
replicated) through BOTH stacks — the shared modulation applies the same
shift/scale/gate to every token, so the reference's [txt; img] concat in
the single stack is algebraically identical to running the two streams
through the same fused projections; keeping them split lets the Ulysses
exchange ride only on image tokens. Text RoPE is applied before
``joint_forward`` (rope commutes with the concat).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.attention.layer import DistributedAttention
from fastvideo_tpu.configs.models.base import DiTArchConfig, ModelConfig
from fastvideo_tpu.layers.embeddings import timestep_embedding
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.mlp import MLP
from fastvideo_tpu.layers.norm import RMSNorm
from fastvideo_tpu.layers.rotary import apply_rotary_emb
from fastvideo_tpu.models.dits.flux import flux_rope
from fastvideo_tpu.models.dits.sd3 import _ln
from fastvideo_tpu.parallel import shard_seq, unshard_seq

Array = jax.Array

FLUX2_PARAM_NAMES_MAPPING: dict[str, str] = {
    # BFL exports carry a "transformer." prefix (reference flux_2.py config)
    r"^transformer\.(\w+)\.(.*)$": r"\1.\2",
    r"^(.*)\.to_out\.0\.(weight|bias)$": r"\1.to_out.\2",
    r"^time_guidance_embed\.timestep_embedder\.linear_1\.(.*)$":
    r"time_guidance_embed.timestep_embedder.fc_in.\1",
    r"^time_guidance_embed\.timestep_embedder\.linear_2\.(.*)$":
    r"time_guidance_embed.timestep_embedder.fc_out.\1",
    r"^time_guidance_embed\.guidance_embedder\.linear_1\.(.*)$":
    r"time_guidance_embed.guidance_embedder.fc_in.\1",
    r"^time_guidance_embed\.guidance_embedder\.linear_2\.(.*)$":
    r"time_guidance_embed.guidance_embedder.fc_out.\1",
}


@dataclasses.dataclass
class Flux2ArchConfig(DiTArchConfig):
    patch_size: int = 1
    in_channels: int = 128
    out_channels: int | None = None
    num_layers: int = 8
    num_single_layers: int = 48
    attention_head_dim: int = 128
    num_attention_heads: int = 48
    joint_attention_dim: int = 15360
    timestep_guidance_channels: int = 256
    mlp_ratio: float = 3.0
    axes_dims_rope: tuple[int, ...] = (32, 32, 32, 32)
    rope_theta: float = 2000.0
    eps: float = 1e-6
    guidance_embeds: bool = True
    ff_context_swiglu_fp32: bool = False

    @property
    def hidden_size(self) -> int:
        return self.attention_head_dim * self.num_attention_heads

    @property
    def num_channels_latents(self) -> int:
        # packed 2x2: transformer channels = 4 * VAE latent channels
        return self.in_channels


@dataclasses.dataclass
class Flux2Config(ModelConfig):
    arch_config: Flux2ArchConfig = dataclasses.field(
        default_factory=Flux2ArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(FLUX2_PARAM_NAMES_MAPPING))


class Flux2Modulation(nnx.Module):
    """silu -> Linear(dim, 3*sets*dim), chunked into (shift, scale, gate)
    triples shared by every block of a stack (reference :720-748)."""

    def __init__(self, dim: int, mod_param_sets: int, *, param_dtype,
                 rngs: nnx.Rngs):
        self.mod_param_sets = mod_param_sets
        self.linear = Linear(dim, dim * 3 * mod_param_sets, bias=False,
                             param_dtype=param_dtype, rngs=rngs)

    def __call__(self, temb: Array):
        mod = self.linear(jax.nn.silu(temb))[:, None]  # [B, 1, 3*sets*D]
        parts = jnp.split(mod.astype(jnp.float32), 3 * self.mod_param_sets,
                          axis=-1)
        return tuple(
            tuple(parts[3 * i:3 * (i + 1)])
            for i in range(self.mod_param_sets))


class Flux2FeedForward(nnx.Module):
    """SwiGLU FF with the gate fused into linear_in (reference :109-171)."""

    def __init__(self, dim: int, mult: float, swiglu_fp32: bool = False, *,
                 param_dtype, rngs: nnx.Rngs):
        inner = int(dim * mult)
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.linear_in = Linear(dim, inner * 2, bias=False, **kw)
        self.linear_out = Linear(inner, dim, bias=False, **kw)
        self.swiglu_fp32 = swiglu_fp32

    def __call__(self, x: Array) -> Array:
        x1, x2 = jnp.split(self.linear_in(x), 2, axis=-1)
        if self.swiglu_fp32:
            h = (jax.nn.silu(x1.astype(jnp.float32)) *
                 x2.astype(jnp.float32)).astype(x.dtype)
        else:
            h = jax.nn.silu(x1) * x2
        return self.linear_out(h)


class Flux2Attention(nnx.Module):
    """Joint text+image attention, bias-free (reference :173-361). Text
    RoPE (4th axis positions) is applied locally before the joint kernel."""

    def __init__(self, dim: int, heads: int, dim_head: int, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.heads, self.head_dim = heads, dim_head
        self.to_q = Linear(dim, dim, bias=False, **kw)
        self.to_k = Linear(dim, dim, bias=False, **kw)
        self.to_v = Linear(dim, dim, bias=False, **kw)
        self.norm_q = RMSNorm(dim_head, eps=1e-6, **kw)
        self.norm_k = RMSNorm(dim_head, eps=1e-6, **kw)
        self.add_q_proj = Linear(dim, dim, bias=False, **kw)
        self.add_k_proj = Linear(dim, dim, bias=False, **kw)
        self.add_v_proj = Linear(dim, dim, bias=False, **kw)
        self.norm_added_q = RMSNorm(dim_head, eps=1e-6, **kw)
        self.norm_added_k = RMSNorm(dim_head, eps=1e-6, **kw)
        self.to_out = Linear(dim, dim, bias=False, **kw)
        self.to_add_out = Linear(dim, dim, bias=False, **kw)
        self.attn = DistributedAttention(heads, dim_head)

    def _h(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.heads, self.head_dim)

    def __call__(self, x: Array, context: Array, img_freqs, txt_freqs):
        b, s, _ = x.shape
        q = self.norm_q(self._h(self.to_q(x))).astype(x.dtype)
        k = self.norm_k(self._h(self.to_k(x))).astype(x.dtype)
        v = self._h(self.to_v(x))
        cq = self.norm_added_q(self._h(self.add_q_proj(context))).astype(
            x.dtype)
        ck = self.norm_added_k(self._h(self.add_k_proj(context))).astype(
            x.dtype)
        cv = self._h(self.add_v_proj(context))
        tcos, tsin = txt_freqs
        cq = apply_rotary_emb(cq, tcos, tsin)
        ck = apply_rotary_emb(ck, tcos, tsin)
        img_out, ctx_out = self.attn.joint_forward(q, k, v, cq, ck, cv,
                                                   freqs_cis=img_freqs)
        img_out = self.to_out(img_out.reshape(b, s, -1))
        ctx_out = self.to_add_out(ctx_out.reshape(b, context.shape[1], -1))
        return img_out, ctx_out


class Flux2TransformerBlock(nnx.Module):
    """Double-stream block driven by the SHARED modulation triples
    (reference :560-675)."""

    def __init__(self, dim: int, heads: int, dim_head: int,
                 mlp_ratio: float, ff_context_swiglu_fp32: bool = False, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.attn = Flux2Attention(dim, heads, dim_head, **kw)
        self.ff = Flux2FeedForward(dim, mlp_ratio, **kw)
        self.ff_context = Flux2FeedForward(dim, mlp_ratio,
                                           swiglu_fp32=ff_context_swiglu_fp32,
                                           **kw)

    def __call__(self, x: Array, context: Array, mods_img, mods_txt,
                 img_freqs, txt_freqs):
        (shift_a, scale_a, gate_a), (shift_m, scale_m, gate_m) = mods_img
        (c_shift_a, c_scale_a, c_gate_a), (c_shift_m, c_scale_m,
                                           c_gate_m) = mods_txt
        norm_x = (_ln(x) * (1 + scale_a) + shift_a).astype(x.dtype)
        norm_ctx = (_ln(context) * (1 + c_scale_a) + c_shift_a).astype(
            context.dtype)
        attn_out, ctx_attn = self.attn(norm_x, norm_ctx, img_freqs,
                                       txt_freqs)
        x = x + (gate_a * attn_out).astype(x.dtype)
        h = (_ln(x) * (1 + scale_m) + shift_m).astype(x.dtype)
        x = x + (gate_m * self.ff(h)).astype(x.dtype)
        context = context + (c_gate_a * ctx_attn).astype(context.dtype)
        ch = (_ln(context) * (1 + c_scale_m) + c_shift_m).astype(
            context.dtype)
        context = context + (c_gate_m * self.ff_context(ch)).astype(
            context.dtype)
        return x, context


class Flux2ParallelSelfAttention(nnx.Module):
    """Fused qkv+mlp projections, attn+mlp joint output projection
    (reference :363-484)."""

    def __init__(self, dim: int, heads: int, dim_head: int,
                 mlp_ratio: float, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.heads, self.head_dim = heads, dim_head
        self.inner_dim = heads * dim_head
        self.mlp_hidden_dim = int(dim * mlp_ratio)
        self.to_qkv_mlp_proj = Linear(
            dim, self.inner_dim * 3 + self.mlp_hidden_dim * 2, bias=False,
            **kw)
        self.norm_q = RMSNorm(dim_head, eps=1e-6, **kw)
        self.norm_k = RMSNorm(dim_head, eps=1e-6, **kw)
        self.to_out = Linear(self.inner_dim + self.mlp_hidden_dim, dim,
                             bias=False, **kw)
        self.attn = DistributedAttention(heads, dim_head)

    def _split(self, x: Array):
        b, s, _ = x.shape
        qkv, mlp = jnp.split(self.to_qkv_mlp_proj(x), [3 * self.inner_dim],
                             axis=-1)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hs = lambda u: u.reshape(b, s, self.heads, self.head_dim)  # noqa
        q = self.norm_q(hs(q)).astype(x.dtype)
        k = self.norm_k(hs(k)).astype(x.dtype)
        return q, k, hs(v), mlp

    def __call__(self, x: Array, context: Array, img_freqs, txt_freqs):
        b, s, _ = x.shape
        q, k, v, mlp = self._split(x)
        cq, ck, cv, cmlp = self._split(context)
        tcos, tsin = txt_freqs
        cq = apply_rotary_emb(cq, tcos, tsin)
        ck = apply_rotary_emb(ck, tcos, tsin)
        img_attn, ctx_attn = self.attn.joint_forward(q, k, v, cq, ck, cv,
                                                     freqs_cis=img_freqs)
        img_out = self.to_out(
            jnp.concatenate(
                [img_attn.reshape(b, s, -1),
                 jax.nn.silu(mlp[..., :self.mlp_hidden_dim]) *
                 mlp[..., self.mlp_hidden_dim:]], axis=-1))
        ctx_out = self.to_out(
            jnp.concatenate(
                [ctx_attn.reshape(b, context.shape[1], -1),
                 jax.nn.silu(cmlp[..., :self.mlp_hidden_dim]) *
                 cmlp[..., self.mlp_hidden_dim:]], axis=-1))
        return img_out, ctx_out


class Flux2SingleTransformerBlock(nnx.Module):
    """Parallel block over the (conceptually concatenated) [txt; img]
    stream; streams stay split here — same math (reference :487-557)."""

    def __init__(self, dim: int, heads: int, dim_head: int,
                 mlp_ratio: float, *, param_dtype, rngs: nnx.Rngs):
        self.attn = Flux2ParallelSelfAttention(dim, heads, dim_head,
                                               mlp_ratio,
                                               param_dtype=param_dtype,
                                               rngs=rngs)

    def __call__(self, x: Array, context: Array, mod, img_freqs, txt_freqs):
        shift, scale, gate = mod
        norm_x = (_ln(x) * (1 + scale) + shift).astype(x.dtype)
        norm_ctx = (_ln(context) * (1 + scale) + shift).astype(context.dtype)
        img_out, ctx_out = self.attn(norm_x, norm_ctx, img_freqs, txt_freqs)
        x = x + (gate * img_out).astype(x.dtype)
        context = context + (gate * ctx_out).astype(context.dtype)
        return x, context


class Flux2AdaLayerNormContinuous(nnx.Module):
    """Bias-free AdaLN-continuous output norm (reference :53-74)."""

    def __init__(self, dim: int, cond_dim: int, *, param_dtype,
                 rngs: nnx.Rngs):
        self.linear = Linear(cond_dim, 2 * dim, bias=False,
                             param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: Array, emb: Array) -> Array:
        scale, shift = jnp.split(
            self.linear(jax.nn.silu(emb)).astype(jnp.float32), 2, axis=-1)
        return (_ln(x) * (1 + scale[:, None]) +
                shift[:, None]).astype(x.dtype)


class Flux2TimestepGuidanceEmbeddings(nnx.Module):
    """Sinusoidal (cos|sin) -> bias-free MLPs; guidance adds
    (reference :675-718)."""

    def __init__(self, in_channels: int, dim: int, guidance_embeds: bool, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.in_channels = in_channels
        self.timestep_embedder = MLP(in_channels, dim, dim, bias=False,
                                     act_type="silu", **kw)
        self.guidance_embedder = (MLP(in_channels, dim, dim, bias=False,
                                      act_type="silu", **kw)
                                  if guidance_embeds else None)

    def __call__(self, timestep: Array, guidance: Array | None) -> Array:
        dtype = self.timestep_embedder.fc_in.kernel.value.dtype
        emb = self.timestep_embedder(
            timestep_embedding(timestep, self.in_channels).astype(dtype))
        if guidance is not None and self.guidance_embedder is not None:
            emb = emb + self.guidance_embedder(
                timestep_embedding(guidance, self.in_channels).astype(dtype))
        return emb


def flux2_text_ids(txt_len: int) -> np.ndarray:
    """[S, 4] ids: zeros on (t, h, w), token index on the 4th axis
    (reference flux_2.py:1047-1051)."""
    ids = np.zeros((txt_len, 4), np.float32)
    ids[:, 3] = np.arange(txt_len, dtype=np.float32)
    return ids


def flux2_image_ids(h_p: int, w_p: int) -> np.ndarray:
    """[S, 4] ids: (0, y, x, 0) (reference flux_2.py:1052-1056)."""
    ids = np.zeros((h_p, w_p, 4), np.float32)
    ids[..., 1] += np.arange(h_p, dtype=np.float32)[:, None]
    ids[..., 2] += np.arange(w_p, dtype=np.float32)[None, :]
    return ids.reshape(h_p * w_p, 4)


class Flux2Transformer2DModel(nnx.Module):
    """FLUX.2 top-level (reference flux_2.py:843-1091)."""

    def __init__(self, config: Flux2ArchConfig, *,
                 param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        dim = config.hidden_size
        self.out_channels = config.out_channels or config.in_channels
        self.x_embedder = Linear(config.in_channels, dim, bias=False, **kw)
        self.context_embedder = Linear(config.joint_attention_dim, dim,
                                       bias=False, **kw)
        self.time_guidance_embed = Flux2TimestepGuidanceEmbeddings(
            config.timestep_guidance_channels, dim, config.guidance_embeds,
            **kw)
        self.double_stream_modulation_img = Flux2Modulation(dim, 2, **kw)
        self.double_stream_modulation_txt = Flux2Modulation(dim, 2, **kw)
        self.single_stream_modulation = Flux2Modulation(dim, 1, **kw)
        self.transformer_blocks = nnx.List([
            Flux2TransformerBlock(dim, config.num_attention_heads,
                                  config.attention_head_dim,
                                  config.mlp_ratio,
                                  config.ff_context_swiglu_fp32, **kw)
            for _ in range(config.num_layers)
        ])
        self.single_transformer_blocks = nnx.List([
            Flux2SingleTransformerBlock(dim, config.num_attention_heads,
                                        config.attention_head_dim,
                                        config.mlp_ratio, **kw)
            for _ in range(config.num_single_layers)
        ])
        self.norm_out = Flux2AdaLayerNormContinuous(dim, dim, **kw)
        self.proj_out = Linear(dim,
                               config.patch_size**2 * self.out_channels,
                               bias=False, **kw)

    def __call__(self, hidden_states: Array, encoder_hidden_states,
                 timestep: Array, img_ids: Array | None = None,
                 txt_ids: Array | None = None,
                 guidance: Array | None = None, **kwargs) -> Array:
        cfg = self.config
        if isinstance(encoder_hidden_states, (list, tuple)):
            encoder_hidden_states = encoder_hidden_states[0]

        input_was_5d = hidden_states.ndim == 5
        if input_was_5d:
            b, c_in, t, h, w = hidden_states.shape
            hidden_states = hidden_states.transpose(0, 2, 3, 4, 1).reshape(
                b, t * h * w, c_in)
            if img_ids is None:
                img_ids = jnp.asarray(flux2_image_ids(h, w))
        if txt_ids is None:
            txt_ids = jnp.asarray(
                flux2_text_ids(encoder_hidden_states.shape[1]))

        x = self.x_embedder(hidden_states)
        context = self.context_embedder(
            encoder_hidden_states.astype(x.dtype))

        ts = timestep.astype(jnp.float32) * 1000.0
        g = None if guidance is None else guidance.astype(
            jnp.float32) * 1000.0
        temb = self.time_guidance_embed(ts, g)
        mods_img = self.double_stream_modulation_img(temb)
        mods_txt = self.double_stream_modulation_txt(temb)
        mod_single = self.single_stream_modulation(temb)[0]

        axes = tuple(cfg.axes_dims_rope)
        img_freqs = flux_rope(img_ids, axes, cfg.rope_theta)
        txt_freqs = flux_rope(txt_ids, axes, cfg.rope_theta)

        x, orig_len = shard_seq(x)
        from fastvideo_tpu.parallel import pad_rope_to
        img_freqs = pad_rope_to(*img_freqs, x.shape[1])
        for block in self.transformer_blocks:
            x, context = block(x, context, mods_img, mods_txt, img_freqs,
                               txt_freqs)
        for block in self.single_transformer_blocks:
            x, context = block(x, context, mod_single, img_freqs, txt_freqs)
        x = unshard_seq(x, orig_len)
        x = self.norm_out(x, temb)
        out = self.proj_out(x)
        if input_was_5d:
            out = out.reshape(b, t, h, w, self.out_channels).transpose(
                0, 4, 1, 2, 3)
        return out


EntryClass = Flux2Transformer2DModel
