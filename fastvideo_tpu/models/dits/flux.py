"""FLUX.1 transformer (packed-latent image MM-DiT), TPU-native.

Behavioral reference: /root/reference/fastvideo/models/dits/flux.py
(:37-578): per-axis 1D RoPE from (idx, y, x) ids, combined
timestep+guidance+pooled-text modulation, text-first joint attention in
double blocks, fused attention+MLP single blocks, AdaLN-Continuous out.
Input/output are packed 2x2-latent tokens (the pipeline packs/unpacks).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.attention import DistributedAttention
from fastvideo_tpu.configs.models.base import DiTArchConfig, ModelConfig
from fastvideo_tpu.layers.embeddings import TimestepEmbedder
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.mlp import MLP
from fastvideo_tpu.layers.norm import RMSNorm
from fastvideo_tpu.layers.rotary import apply_rotary_emb
from fastvideo_tpu.models.dits.sd3 import (AdaLayerNormContinuous,
                                           AdaLayerNormZero, _ln)
from fastvideo_tpu.parallel import shard_seq, unshard_seq

Array = jax.Array

FLUX_PARAM_NAMES_MAPPING: dict[str, str] = {
    # single blocks hold q/k/v + norms directly (torch nests them in .attn)
    r"^(single_transformer_blocks\.\d+)\.attn\."
    r"(to_q|to_k|to_v|norm_q|norm_k)\.(.*)$": r"\1.\2.\3",
    r"^(.*)time_text_embed\.timestep_embedder\.linear_1\.(.*)$":
    r"\1time_text_embed.timestep_embedder.mlp.fc_in.\2",
    r"^(.*)time_text_embed\.timestep_embedder\.linear_2\.(.*)$":
    r"\1time_text_embed.timestep_embedder.mlp.fc_out.\2",
    r"^(.*)time_text_embed\.guidance_embedder\.linear_1\.(.*)$":
    r"\1time_text_embed.guidance_embedder.mlp.fc_in.\2",
    r"^(.*)time_text_embed\.guidance_embedder\.linear_2\.(.*)$":
    r"\1time_text_embed.guidance_embedder.mlp.fc_out.\2",
    r"^(.*)time_text_embed\.text_embedder\.linear_1\.(.*)$":
    r"\1time_text_embed.text_embedder.fc_in.\2",
    r"^(.*)time_text_embed\.text_embedder\.linear_2\.(.*)$":
    r"\1time_text_embed.text_embedder.fc_out.\2",
    r"^(.*)\.to_out\.0\.(weight|bias)$": r"\1.to_out.\2",
    r"^(.*)\.ff\.net\.0\.proj\.(.*)$": r"\1.ff.fc_in.\2",
    r"^(.*)\.ff\.net\.2\.(.*)$": r"\1.ff.fc_out.\2",
    r"^(.*)\.ff_context\.net\.0\.proj\.(.*)$": r"\1.ff_context.fc_in.\2",
    r"^(.*)\.ff_context\.net\.2\.(.*)$": r"\1.ff_context.fc_out.\2",
}


@dataclasses.dataclass
class FluxArchConfig(DiTArchConfig):
    patch_size: int = 1
    in_channels: int = 64
    out_channels: int | None = None
    num_layers: int = 19
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    pooled_projection_dim: int = 768
    guidance_embeds: bool = True
    axes_dims_rope: tuple[int, int, int] = (16, 56, 56)

    @property
    def hidden_size(self) -> int:
        return self.attention_head_dim * self.num_attention_heads

    @property
    def num_channels_latents(self) -> int:
        return self.in_channels // 4


@dataclasses.dataclass
class FluxConfig(ModelConfig):
    arch_config: FluxArchConfig = dataclasses.field(
        default_factory=FluxArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(FLUX_PARAM_NAMES_MAPPING))


def flux_rope(ids: Array, axes_dim: tuple[int, ...],
              theta: float = 10000.0) -> tuple[Array, Array]:
    """Per-axis 1D rope tables from [S, n_axes] ids -> [S, sum(axes_dim)]
    (reference flux.py:37-66; interleaved repeat for rotate-half)."""
    cos_parts, sin_parts = [], []
    pos = ids.astype(jnp.float32)
    for i, dim in enumerate(axes_dim):
        freqs = 1.0 / (theta**(jnp.arange(0, dim, 2, dtype=jnp.float32) /
                               dim))
        angles = pos[:, i][:, None] * freqs[None]
        cos_parts.append(jnp.repeat(jnp.cos(angles), 2, axis=-1))
        sin_parts.append(jnp.repeat(jnp.sin(angles), 2, axis=-1))
    return (jnp.concatenate(cos_parts, axis=-1),
            jnp.concatenate(sin_parts, axis=-1))


class FluxCombinedTimestepGuidanceTextProjEmbeddings(nnx.Module):
    def __init__(self, embedding_dim: int, pooled_projection_dim: int,
                 guidance_embeds: bool, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.timestep_embedder = TimestepEmbedder(embedding_dim,
                                                  act_layer="silu", **kw)
        self.guidance_embedder = (TimestepEmbedder(embedding_dim,
                                                   act_layer="silu", **kw)
                                  if guidance_embeds else None)
        self.text_embedder = MLP(pooled_projection_dim, embedding_dim,
                                 embedding_dim, act_type="silu", **kw)

    def __call__(self, timestep: Array, guidance: Array | None,
                 pooled: Array) -> Array:
        emb = self.timestep_embedder(timestep)
        if self.guidance_embedder is not None:
            if guidance is None:
                raise ValueError("guidance required (guidance_embeds=True)")
            emb = emb + self.guidance_embedder(guidance)
        return emb + self.text_embedder(
            pooled.astype(self.text_embedder.fc_in.kernel.value.dtype))


class FluxJointAttention(nnx.Module):
    """Text-first joint attention (reference flux.py:125-212); rope on the
    image tokens (text ids are zero -> identity rotation)."""

    def __init__(self, dim: int, heads: int, dim_head: int, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.heads, self.head_dim = heads, dim_head
        self.norm_q = RMSNorm(dim_head, eps=1e-6, **kw)
        self.norm_k = RMSNorm(dim_head, eps=1e-6, **kw)
        self.norm_added_q = RMSNorm(dim_head, eps=1e-6, **kw)
        self.norm_added_k = RMSNorm(dim_head, eps=1e-6, **kw)
        self.to_q = Linear(dim, dim, **kw)
        self.to_k = Linear(dim, dim, **kw)
        self.to_v = Linear(dim, dim, **kw)
        self.add_q_proj = Linear(dim, dim, **kw)
        self.add_k_proj = Linear(dim, dim, **kw)
        self.add_v_proj = Linear(dim, dim, **kw)
        self.to_out = Linear(dim, dim, **kw)
        self.to_add_out = Linear(dim, dim, **kw)
        self.attn = DistributedAttention(heads, dim_head)

    def _h(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.heads, self.head_dim)

    def __call__(self, x: Array, context: Array,
                 freqs_cis: tuple[Array, Array],
                 kv_valid: int | None = None):
        b, s, _ = x.shape
        q = self.norm_q(self._h(self.to_q(x))).astype(x.dtype)
        k = self.norm_k(self._h(self.to_k(x))).astype(x.dtype)
        v = self._h(self.to_v(x))
        cq = self.norm_added_q(self._h(self.add_q_proj(context))).astype(
            x.dtype)
        ck = self.norm_added_k(self._h(self.add_k_proj(context))).astype(
            x.dtype)
        cv = self._h(self.add_v_proj(context))
        img_out, ctx_out = self.attn.joint_forward(q, k, v, cq, ck, cv,
                                                   freqs_cis=freqs_cis,
                                                   kv_valid=kv_valid)
        img_out = self.to_out(img_out.reshape(b, s, -1))
        ctx_out = self.to_add_out(ctx_out.reshape(b, context.shape[1], -1))
        return img_out, ctx_out


class FluxTransformerBlock(nnx.Module):
    def __init__(self, dim: int, heads: int, dim_head: int, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm1 = AdaLayerNormZero(dim, 6, **kw)
        self.norm1_context = AdaLayerNormZero(dim, 6, **kw)
        self.attn = FluxJointAttention(dim, heads, dim_head, **kw)
        self.ff = MLP(dim, dim * 4, dim, act_type="gelu_pytorch_tanh", **kw)
        self.ff_context = MLP(dim, dim * 4, dim,
                              act_type="gelu_pytorch_tanh", **kw)

    def __call__(self, x: Array, context: Array, temb: Array,
                 freqs_cis: tuple[Array, Array],
                 kv_valid: int | None = None):
        norm_x, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.norm1(
            x, temb)
        norm_ctx, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = \
            self.norm1_context(context, temb)
        attn_out, ctx_attn = self.attn(norm_x.astype(x.dtype),
                                       norm_ctx.astype(x.dtype), freqs_cis,
                                       kv_valid)
        x = x + gate_msa[:, None] * attn_out
        h = _ln(x) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        x = x + gate_mlp[:, None] * self.ff(h.astype(x.dtype))
        context = context + c_gate_msa[:, None] * ctx_attn
        ch = _ln(context) * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        context = context + c_gate_mlp[:, None] * self.ff_context(
            ch.astype(context.dtype))
        return x, context


class FluxSingleTransformerBlock(nnx.Module):
    """Fused attention+MLP block over [text, image] (reference :332-381)."""

    def __init__(self, dim: int, heads: int, dim_head: int,
                 mlp_ratio: float = 4.0, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.heads, self.head_dim = heads, dim_head
        mlp_hidden = int(dim * mlp_ratio)
        self.norm = AdaLayerNormZero(dim, 3, **kw)
        self.proj_mlp = Linear(dim, mlp_hidden, **kw)
        self.proj_out = Linear(dim + mlp_hidden, dim, **kw)
        self.norm_q = RMSNorm(dim_head, eps=1e-6, **kw)
        self.norm_k = RMSNorm(dim_head, eps=1e-6, **kw)
        self.to_q = Linear(dim, dim, **kw)
        self.to_k = Linear(dim, dim, **kw)
        self.to_v = Linear(dim, dim, **kw)
        self.attn = DistributedAttention(heads, dim_head)

    def _h(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.heads, self.head_dim)

    def __call__(self, x: Array, context: Array, temb: Array,
                 freqs_cis: tuple[Array, Array],
                 kv_valid: int | None = None):
        mods = jnp.split(self.norm.linear(jax.nn.silu(temb)), 3, axis=-1)
        shift_msa, scale_msa, gate = mods

        def normed(u):
            return (_ln(u) * (1 + scale_msa[:, None]) +
                    shift_msa[:, None]).astype(u.dtype)

        norm_x, norm_ctx = normed(x), normed(context)
        b, s, _ = norm_x.shape
        q = self.norm_q(self._h(self.to_q(norm_x))).astype(x.dtype)
        k = self.norm_k(self._h(self.to_k(norm_x))).astype(x.dtype)
        v = self._h(self.to_v(norm_x))
        cq = self.norm_q(self._h(self.to_q(norm_ctx))).astype(x.dtype)
        ck = self.norm_k(self._h(self.to_k(norm_ctx))).astype(x.dtype)
        cv = self._h(self.to_v(norm_ctx))
        img_attn, ctx_attn = self.attn.joint_forward(q, k, v, cq, ck, cv,
                                                     freqs_cis=freqs_cis,
                                                     kv_valid=kv_valid)
        img_attn = img_attn.reshape(b, s, -1)
        ctx_attn = ctx_attn.reshape(b, context.shape[1], -1)

        def fuse(u, attn_u):
            mlp = jax.nn.gelu(self.proj_mlp(u), approximate=True)
            out = self.proj_out(jnp.concatenate([attn_u, mlp], axis=-1))
            return gate[:, None] * out

        x = x + fuse(norm_x, img_attn)
        context = context + fuse(norm_ctx, ctx_attn)
        return x, context


class FluxTransformer2DModel(nnx.Module):
    """FLUX.1 packed-latent transformer (reference flux.py:383-578)."""

    def __init__(self, config: FluxArchConfig, *,
                 param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        dim = config.hidden_size
        self.out_channels = config.out_channels or config.in_channels
        self.x_embedder = Linear(config.in_channels, dim, **kw)
        self.context_embedder = Linear(config.joint_attention_dim, dim, **kw)
        self.time_text_embed = FluxCombinedTimestepGuidanceTextProjEmbeddings(
            dim, config.pooled_projection_dim, config.guidance_embeds, **kw)
        self.transformer_blocks = nnx.List([
            FluxTransformerBlock(dim, config.num_attention_heads,
                                 config.attention_head_dim, **kw)
            for _ in range(config.num_layers)
        ])
        self.single_transformer_blocks = nnx.List([
            FluxSingleTransformerBlock(dim, config.num_attention_heads,
                                       config.attention_head_dim, **kw)
            for _ in range(config.num_single_layers)
        ])
        self.norm_out = AdaLayerNormContinuous(dim, dim, **kw)
        self.proj_out = Linear(
            dim, config.patch_size**2 * self.out_channels, **kw)

    def __call__(self, hidden_states: Array, encoder_hidden_states: Array,
                 timestep: Array, pooled_projections: Array | None = None,
                 img_ids: Array | None = None, txt_ids: Array | None = None,
                 guidance: Array | None = None, **kwargs) -> Array:
        cfg = self.config
        if pooled_projections is None or img_ids is None:
            raise ValueError("pooled_projections and img_ids are required")
        x = self.x_embedder(hidden_states)
        ts = timestep.astype(jnp.float32) * 1000.0
        g = None if guidance is None else guidance.astype(
            jnp.float32) * 1000.0
        temb = self.time_text_embed(ts, g, pooled_projections)
        context = self.context_embedder(
            encoder_hidden_states.astype(x.dtype))
        freqs_cis = flux_rope(img_ids, tuple(cfg.axes_dims_rope))
        x, orig_len = shard_seq(x)
        from fastvideo_tpu.parallel import pad_rope_to
        freqs_cis = pad_rope_to(*freqs_cis, x.shape[1])
        kv_valid = orig_len if x.shape[1] != orig_len else None
        for block in self.transformer_blocks:
            x, context = block(x, context, temb, freqs_cis, kv_valid)
        for block in self.single_transformer_blocks:
            x, context = block(x, context, temb, freqs_cis, kv_valid)
        x = unshard_seq(x, orig_len)
        x = self.norm_out(x, temb)
        return self.proj_out(x)


EntryClass = FluxTransformer2DModel
