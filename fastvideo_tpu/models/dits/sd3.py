"""SD3 / SD3.5 MM-DiT (2D image transformer), TPU-native.

Behavioral reference: /root/reference/fastvideo/models/dits/sd3.py
(:108-1078): cropped 2D sincos positional embedding, combined
timestep+pooled-text modulation vector, joint image/text attention blocks
(AdaLN-Zero; SD3.5's dual-attention X variant on selected layers; final
block context_pre_only with AdaLN-Continuous), 2D unpatchify.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.attention import DistributedAttention
from fastvideo_tpu.configs.models.base import DiTArchConfig, ModelConfig
from fastvideo_tpu.layers.embeddings import TimestepEmbedder
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.mlp import MLP
from fastvideo_tpu.layers.norm import RMSNorm
from fastvideo_tpu.parallel import shard_seq, unshard_seq

Array = jax.Array

SD3_PARAM_NAMES_MAPPING: dict[str, str] = {
    r"^(.*)time_text_embed\.timestep_embedder\.linear_1\.(.*)$":
    r"\1time_text_embed.timestep_embedder.mlp.fc_in.\2",
    r"^(.*)time_text_embed\.timestep_embedder\.linear_2\.(.*)$":
    r"\1time_text_embed.timestep_embedder.mlp.fc_out.\2",
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
class SD3ArchConfig(DiTArchConfig):
    sample_size: int = 128
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 24
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    caption_projection_dim: int = 1536
    pooled_projection_dim: int = 2048
    pos_embed_max_size: int = 192
    qk_norm: str | None = "rms_norm"
    dual_attention_layers: tuple[int, ...] = ()

    @property
    def hidden_size(self) -> int:
        return self.attention_head_dim * self.num_attention_heads

    @property
    def num_channels_latents(self) -> int:
        return self.in_channels


@dataclasses.dataclass
class SD3Config(ModelConfig):
    arch_config: SD3ArchConfig = dataclasses.field(
        default_factory=SD3ArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(SD3_PARAM_NAMES_MAPPING))


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / (10000.0**omega)
    out = np.outer(pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int,
                            base_size: int = 16,
                            interpolation_scale: float = 1.0) -> np.ndarray:
    """[grid*grid, D] table (reference sd3.py:47-105)."""
    grid_h = np.arange(grid_size, dtype=np.float32) / (
        grid_size / base_size) / interpolation_scale
    grid_w = np.arange(grid_size, dtype=np.float32) / (
        grid_size / base_size) / interpolation_scale
    gw, gh = np.meshgrid(grid_w, grid_h)  # indexing="xy" pairs
    emb_h = _sincos_1d(embed_dim // 2, gw)
    emb_w = _sincos_1d(embed_dim // 2, gh)
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


class SD3PatchEmbed(nnx.Module):
    """2D patchify + cropped positional embedding (reference :108-235)."""

    def __init__(self, sample_size: int, patch_size: int, in_channels: int,
                 embed_dim: int, pos_embed_max_size: int, *,
                 param_dtype, rngs: nnx.Rngs):
        self.patch_size = patch_size
        self.pos_embed_max_size = pos_embed_max_size
        self.proj = Linear(in_channels * patch_size * patch_size, embed_dim,
                           param_dtype=param_dtype, rngs=rngs)
        base_size = sample_size // patch_size
        table = get_2d_sincos_pos_embed(embed_dim, pos_embed_max_size,
                                        base_size=base_size)
        self.pos_embed = nnx.Variable(jnp.asarray(table[None]))

    def cropped_pos_embed(self, height: int, width: int) -> Array:
        h = height // self.patch_size
        w = width // self.patch_size
        m = self.pos_embed_max_size
        top, left = (m - h) // 2, (m - w) // 2
        spatial = self.pos_embed.value.reshape(1, m, m, -1)
        spatial = spatial[:, top:top + h, left:left + w]
        return spatial.reshape(1, h * w, -1)

    def __call__(self, latent: Array) -> Array:
        """[B, C, H, W] -> [B, h*w, D] with pos embed added."""
        b, c, hh, ww = latent.shape
        p = self.patch_size
        x = latent.reshape(b, c, hh // p, p, ww // p, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(
            b, (hh // p) * (ww // p), c * p * p)
        x = self.proj(x)
        return x + self.cropped_pos_embed(hh, ww).astype(x.dtype)


class CombinedTimestepTextProjEmbeddings(nnx.Module):
    def __init__(self, embedding_dim: int, pooled_projection_dim: int, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.timestep_embedder = TimestepEmbedder(embedding_dim,
                                                  act_layer="silu", **kw)
        self.text_embedder = MLP(pooled_projection_dim, embedding_dim,
                                 embedding_dim, act_type="silu", **kw)

    def __call__(self, timestep: Array, pooled: Array) -> Array:
        return self.timestep_embedder(timestep) + self.text_embedder(
            pooled.astype(self.text_embedder.fc_in.kernel.value.dtype))


class AdaLayerNormZero(nnx.Module):
    """SiLU -> Linear(dim, n*dim) + non-affine LN (reference :365-435)."""

    def __init__(self, dim: int, n_mods: int = 6, *, param_dtype,
                 rngs: nnx.Rngs):
        self.n_mods = n_mods
        self.linear = Linear(dim, n_mods * dim, param_dtype=param_dtype,
                             rngs=rngs)

    def __call__(self, x: Array, emb: Array):
        mods = jnp.split(self.linear(jax.nn.silu(emb)), self.n_mods, axis=-1)
        normed = _ln(x)
        out = normed * (1 + mods[1][:, None]) + mods[0][:, None]
        if self.n_mods == 9:
            out2 = normed * (1 + mods[7][:, None]) + mods[6][:, None]
            # (x_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp, x_msa2, gate2)
            return out, mods[2], mods[3], mods[4], mods[5], out2, mods[8]
        return out, mods[2], mods[3], mods[4], mods[5]


class AdaLayerNormContinuous(nnx.Module):
    def __init__(self, dim: int, cond_dim: int, *, param_dtype,
                 rngs: nnx.Rngs):
        self.linear = Linear(cond_dim, 2 * dim, param_dtype=param_dtype,
                             rngs=rngs)

    def __call__(self, x: Array, emb: Array) -> Array:
        scale, shift = jnp.split(
            self.linear(jax.nn.silu(emb)).astype(jnp.float32), 2, axis=-1)
        return (_ln(x) * (1 + scale[:, None]) +
                shift[:, None]).astype(x.dtype)


def _ln(x: Array, eps: float = 1e-6) -> Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps)


class SD3Attention(nnx.Module):
    """Joint self-attention (reference :526-680)."""

    def __init__(self, dim: int, heads: int, dim_head: int,
                 added_kv: bool, context_pre_only: bool | None,
                 qk_norm: str | None, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.heads = heads
        self.head_dim = dim_head
        self.to_q = Linear(dim, dim, **kw)
        self.to_k = Linear(dim, dim, **kw)
        self.to_v = Linear(dim, dim, **kw)
        use_norm = qk_norm == "rms_norm"
        self.norm_q = RMSNorm(dim_head, eps=1e-6, **kw) if use_norm else None
        self.norm_k = RMSNorm(dim_head, eps=1e-6, **kw) if use_norm else None
        if added_kv:
            self.add_q_proj = Linear(dim, dim, **kw)
            self.add_k_proj = Linear(dim, dim, **kw)
            self.add_v_proj = Linear(dim, dim, **kw)
            self.norm_added_q = (RMSNorm(dim_head, eps=1e-6, **kw)
                                 if use_norm else None)
            self.norm_added_k = (RMSNorm(dim_head, eps=1e-6, **kw)
                                 if use_norm else None)
        else:
            self.add_q_proj = None
            self.add_k_proj = None
            self.add_v_proj = None
            self.norm_added_q = None
            self.norm_added_k = None
        self.to_out = Linear(dim, dim, **kw)
        self.to_add_out = (Linear(dim, dim, **kw)
                           if context_pre_only is False else None)
        self.attn = DistributedAttention(heads, dim_head)

    def _heads(self, x: Array) -> Array:
        b, s, _ = x.shape
        return x.reshape(b, s, self.heads, self.head_dim)

    def __call__(self, x: Array, context: Array | None = None):
        b, s, _ = x.shape
        q = self._heads(self.to_q(x))
        k = self._heads(self.to_k(x))
        v = self._heads(self.to_v(x))
        if self.norm_q is not None:
            q = self.norm_q(q).astype(x.dtype)
            k = self.norm_k(k).astype(x.dtype)
        if context is None:
            out = self.attn(q, k, v)
            return self.to_out(out.reshape(b, s, -1))
        cq = self._heads(self.add_q_proj(context))
        ck = self._heads(self.add_k_proj(context))
        cv = self._heads(self.add_v_proj(context))
        if self.norm_added_q is not None:
            cq = self.norm_added_q(cq).astype(x.dtype)
            ck = self.norm_added_k(ck).astype(x.dtype)
        img_out, ctx_out = self.attn.joint_forward(q, k, v, cq, ck, cv)
        img_out = self.to_out(img_out.reshape(b, s, -1))
        ctx_out = ctx_out.reshape(b, context.shape[1], -1)
        if self.to_add_out is not None:
            ctx_out = self.to_add_out(ctx_out)
        return img_out, ctx_out


class SD3JointTransformerBlock(nnx.Module):
    def __init__(self, dim: int, heads: int, dim_head: int,
                 context_pre_only: bool, qk_norm: str | None,
                 use_dual_attention: bool, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.context_pre_only = context_pre_only
        self.use_dual_attention = use_dual_attention
        self.norm1 = AdaLayerNormZero(dim, 9 if use_dual_attention else 6,
                                      **kw)
        if context_pre_only:
            self.norm1_context = AdaLayerNormContinuous(dim, dim, **kw)
        else:
            self.norm1_context = AdaLayerNormZero(dim, 6, **kw)
        self.attn = SD3Attention(dim, heads, dim_head, added_kv=True,
                                 context_pre_only=context_pre_only,
                                 qk_norm=qk_norm, **kw)
        self.attn2 = (SD3Attention(dim, heads, dim_head, added_kv=False,
                                   context_pre_only=None, qk_norm=qk_norm,
                                   **kw) if use_dual_attention else None)
        self.ff = MLP(dim, dim * 4, dim, act_type="gelu_pytorch_tanh", **kw)
        self.ff_context = (None if context_pre_only else
                           MLP(dim, dim * 4, dim,
                               act_type="gelu_pytorch_tanh", **kw))

    def __call__(self, x: Array, context: Array, temb: Array):
        if self.use_dual_attention:
            (norm_x, gate_msa, shift_mlp, scale_mlp, gate_mlp, norm_x2,
             gate_msa2) = self.norm1(x, temb)
        else:
            norm_x, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.norm1(
                x, temb)

        if self.context_pre_only:
            norm_ctx = self.norm1_context(context, temb)
            c_mods = None
        else:
            norm_ctx, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = \
                self.norm1_context(context, temb)
            c_mods = (c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp)

        attn_out, ctx_attn = self.attn(norm_x.astype(x.dtype),
                                       norm_ctx.astype(x.dtype))
        x = x + gate_msa[:, None] * attn_out
        if self.use_dual_attention:
            x = x + gate_msa2[:, None] * self.attn2(norm_x2.astype(x.dtype))

        h = _ln(x) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        x = x + gate_mlp[:, None] * self.ff(h.astype(x.dtype))

        if self.context_pre_only:
            return x, None
        c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = c_mods
        context = context + c_gate_msa[:, None] * ctx_attn
        ch = _ln(context) * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        context = context + c_gate_mlp[:, None] * self.ff_context(
            ch.astype(context.dtype))
        return x, context


class SD3Transformer2DModel(nnx.Module):
    """SD3/SD3.5 image MM-DiT (reference sd3.py:870-1078)."""

    def __init__(self, config: SD3ArchConfig, *,
                 param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        dim = config.hidden_size
        self.out_channels = config.out_channels or config.in_channels
        self.pos_embed = SD3PatchEmbed(config.sample_size, config.patch_size,
                                       config.in_channels, dim,
                                       config.pos_embed_max_size, **kw)
        self.time_text_embed = CombinedTimestepTextProjEmbeddings(
            dim, config.pooled_projection_dim, **kw)
        self.context_embedder = Linear(config.joint_attention_dim,
                                       config.caption_projection_dim, **kw)
        dual = set(config.dual_attention_layers or ())
        self.transformer_blocks = nnx.List([
            SD3JointTransformerBlock(
                dim, config.num_attention_heads, config.attention_head_dim,
                context_pre_only=(i == config.num_layers - 1),
                qk_norm=config.qk_norm, use_dual_attention=(i in dual), **kw)
            for i in range(config.num_layers)
        ])
        self.norm_out = AdaLayerNormContinuous(dim, dim, **kw)
        self.proj_out = Linear(
            dim, config.patch_size**2 * self.out_channels, **kw)

    def __call__(self, hidden_states: Array, encoder_hidden_states: Array,
                 timestep: Array, pooled_projections: Array | None = None,
                 **kwargs) -> Array:
        cfg = self.config
        if pooled_projections is None:
            raise ValueError("pooled_projections must be provided")
        b, c, hh, ww = hidden_states.shape
        x = self.pos_embed(hidden_states)
        x, orig_len = shard_seq(x)
        temb = self.time_text_embed(timestep.astype(jnp.float32),
                                    pooled_projections)
        context = self.context_embedder(
            encoder_hidden_states.astype(x.dtype))
        for block in self.transformer_blocks:
            x, context = block(x, context, temb)
        x = unshard_seq(x, orig_len)
        x = self.norm_out(x, temb)
        x = self.proj_out(x)
        p = cfg.patch_size
        h, w = hh // p, ww // p
        x = x.reshape(b, h, w, p, p, self.out_channels)
        x = jnp.einsum("nhwpqc->nchpwq", x)
        return x.reshape(b, self.out_channels, h * p, w * p)


EntryClass = SD3Transformer2DModel
