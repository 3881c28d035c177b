"""Cosmos-Predict2.5 ("MiniTrainDIT") video transformer, TPU-native.

Behavioral reference: /root/reference/fastvideo/models/dits/cosmos2_5.py
(:24-967): AdaLN-LoRA conditioning with PER-FRAME timesteps ([B, T]),
condition-mask (+1 ch) and padding-mask (+1 ch) channels concatenated
before the patch embed, NTK-scaled half-split 3D rope with optional fps
modulation, an optional Reason1 cross-attention projection
(full-concat Qwen hidden states -> text_embed_dim), and a final AdaLN
layer whose shift/scale add the adaln-lora slice. Structure shares the
Cosmos-Predict2 components (models/dits/cosmos.py) — the block math is
identical; only the modulation heads are per-sub-layer with LoRA rank.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.base import DiTArchConfig, ModelConfig
from fastvideo_tpu.layers.embeddings import timestep_embedding
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.mlp import MLP
from fastvideo_tpu.layers.norm import RMSNorm
from fastvideo_tpu.models.dits.cosmos import (CosmosAttention,
                                              CosmosPatchEmbed, cosmos_rope)
from fastvideo_tpu.models.dits.sd3 import _ln
from fastvideo_tpu.parallel import shard_seq, unshard_seq

Array = jax.Array

# reference sequential indices (adaln_modulation_*.1/.2) -> linear_1/2
COSMOS25_PARAM_NAMES_MAPPING: dict[str, str] = {
    r"^(.*adaln_modulation_\w+)\.1\.(.*)$": r"\1.linear_1.\2",
    r"^(.*adaln_modulation_\w+)\.2\.(.*)$": r"\1.linear_2.\2",
    r"^(.*crossattn_proj)\.0\.(.*)$": r"\1.proj.\2",
}


@dataclasses.dataclass
class Cosmos25ArchConfig(DiTArchConfig):
    in_channels: int = 16
    out_channels: int = 16
    num_attention_heads: int = 16
    attention_head_dim: int = 128
    num_layers: int = 28
    mlp_ratio: float = 4.0
    text_embed_dim: int = 1024
    adaln_lora_dim: int = 256
    use_adaln_lora: bool = True
    patch_size: tuple[int, int, int] = (1, 2, 2)
    max_size: tuple[int, int, int] = (128, 240, 240)
    rope_scale: tuple[float, float, float] = (1.0, 3.0, 3.0)
    concat_padding_mask: bool = True
    extra_pos_embed_type: str | None = None
    use_crossattn_projection: bool = True
    crossattn_proj_in_channels: int = 100352
    rope_enable_fps_modulation: bool = False
    qk_norm: str = "rms_norm"

    @property
    def hidden_size(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def num_channels_latents(self) -> int:
        return self.in_channels

    @property
    def patch_size_thw(self) -> tuple[int, int, int]:
        return tuple(self.patch_size)


@dataclasses.dataclass
class Cosmos25VideoConfig(ModelConfig):
    arch_config: Cosmos25ArchConfig = dataclasses.field(
        default_factory=Cosmos25ArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(COSMOS25_PARAM_NAMES_MAPPING))


class Cosmos25TimestepEmbedding(nnx.Module):
    """(reference :68-110): emits (sinusoid input, 3D lora params)."""

    def __init__(self, in_features: int, out_features: int,
                 use_adaln_lora: bool, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(bias=False, param_dtype=param_dtype, rngs=rngs)
        self.use_adaln_lora = use_adaln_lora
        self.linear_1 = Linear(in_features, out_features, **kw)
        self.linear_2 = Linear(out_features,
                               3 * out_features if use_adaln_lora else
                               out_features, **kw)

    def __call__(self, sample: Array) -> tuple[Array, Array | None]:
        emb = self.linear_2(jax.nn.silu(self.linear_1(sample)))
        if self.use_adaln_lora:
            return sample, emb  # (standard embedding = input, lora 3D)
        return emb, None


class Cosmos25Embedding(nnx.Module):
    def __init__(self, embedding_dim: int, condition_dim: int,
                 use_adaln_lora: bool, *, param_dtype, rngs: nnx.Rngs):
        self.embedding_dim = embedding_dim
        self.t_embedder = Cosmos25TimestepEmbedding(
            embedding_dim, condition_dim, use_adaln_lora,
            param_dtype=param_dtype, rngs=rngs)
        self.norm = RMSNorm(embedding_dim, eps=1e-6,
                            param_dtype=param_dtype, rngs=rngs)

    def __call__(self, timestep: Array, dtype) -> tuple[Array, Array | None]:
        """timestep [B, T] (model units: the pipeline's t * 0.001) ->
        (embedded [B, T, D], lora [B, T, 3D])."""
        b, t = timestep.shape
        proj = timestep_embedding(timestep.reshape(-1), self.embedding_dim)
        proj = proj.reshape(b, t, -1).astype(dtype)
        embedded, lora = self.t_embedder(proj)
        return self.norm(embedded).astype(dtype), lora


class Cosmos25Modulation(nnx.Module):
    """SiLU -> LoRA bottleneck -> 3D (reference adaln_modulation_*)."""

    def __init__(self, hidden: int, lora_dim: int, use_adaln_lora: bool, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(bias=False, param_dtype=param_dtype, rngs=rngs)
        if use_adaln_lora:
            self.linear_1 = Linear(hidden, lora_dim, **kw)
            self.linear_2 = Linear(lora_dim, 3 * hidden, **kw)
        else:
            self.linear_1 = None
            self.linear_2 = Linear(hidden, 3 * hidden, **kw)

    def __call__(self, emb: Array) -> Array:
        x = jax.nn.silu(emb)
        if self.linear_1 is not None:
            x = self.linear_1(x)
        return self.linear_2(x)


class Cosmos25TransformerBlock(nnx.Module):
    """self-attn + cross-attn + MLP, per-sub-layer adaln (reference
    :362-527). Runs on flattened tokens; per-frame modulations are
    expanded to tokens by the caller."""

    def __init__(self, num_heads: int, head_dim: int,
                 cross_attention_dim: int, mlp_ratio: float,
                 adaln_lora_dim: int, use_adaln_lora: bool, *, param_dtype,
                 rngs: nnx.Rngs):
        hidden = num_heads * head_dim
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.attn1 = CosmosAttention(hidden, num_heads, None, eps=1e-6,
                                     **kw)
        self.attn2 = CosmosAttention(hidden, num_heads,
                                     cross_attention_dim, eps=1e-6, **kw)
        self.mlp = MLP(hidden, int(hidden * mlp_ratio), hidden, bias=False,
                       act_type="gelu", **kw)
        self.adaln_modulation_self_attn = Cosmos25Modulation(
            hidden, adaln_lora_dim, use_adaln_lora, **kw)
        self.adaln_modulation_cross_attn = Cosmos25Modulation(
            hidden, adaln_lora_dim, use_adaln_lora, **kw)
        self.adaln_modulation_mlp = Cosmos25Modulation(
            hidden, adaln_lora_dim, use_adaln_lora, **kw)

    @staticmethod
    def _mod3(params: Array) -> tuple[Array, Array, Array]:
        return tuple(p.astype(jnp.float32)
                     for p in jnp.split(params, 3, axis=-1))

    def __call__(self, x: Array, context: Array, embedded_timestep: Array,
                 adaln_lora: Array | None, freqs_cis) -> Array:
        def mods(mod_layer):
            p = mod_layer(embedded_timestep)
            if adaln_lora is not None:
                p = p + adaln_lora
            return self._mod3(p)

        s_sh, s_sc, s_g = mods(self.adaln_modulation_self_attn)
        c_sh, c_sc, c_g = mods(self.adaln_modulation_cross_attn)
        m_sh, m_sc, m_g = mods(self.adaln_modulation_mlp)

        h = (_ln(x) * (1 + s_sc) + s_sh).astype(x.dtype)
        x = x + (s_g * self.attn1(h, freqs_cis=freqs_cis)
                 .astype(jnp.float32)).astype(x.dtype)
        h = (_ln(x) * (1 + c_sc) + c_sh).astype(x.dtype)
        x = x + (c_g * self.attn2(h, context=context)
                 .astype(jnp.float32)).astype(x.dtype)
        h = (_ln(x) * (1 + m_sc) + m_sh).astype(x.dtype)
        x = x + (m_g * self.mlp(h).astype(jnp.float32)).astype(x.dtype)
        return x


class Cosmos25FinalLayer(nnx.Module):
    def __init__(self, hidden: int, out_channels: int,
                 patch_size: tuple[int, int, int], adaln_lora_dim: int,
                 use_adaln_lora: bool, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(bias=False, param_dtype=param_dtype, rngs=rngs)
        self.hidden = hidden
        self.use_adaln_lora = use_adaln_lora
        if use_adaln_lora:
            self.linear_1 = Linear(hidden, adaln_lora_dim, **kw)
            self.linear_2 = Linear(adaln_lora_dim, 2 * hidden, **kw)
        else:
            self.linear_1 = None
            self.linear_2 = Linear(hidden, 2 * hidden, **kw)
        self.proj_out = Linear(hidden,
                               out_channels * math.prod(patch_size), **kw)

    def __call__(self, x: Array, embedded_timestep: Array,
                 adaln_lora: Array | None) -> Array:
        e = jax.nn.silu(embedded_timestep)
        if self.linear_1 is not None:
            e = self.linear_1(e)
        e = self.linear_2(e)
        if self.use_adaln_lora and adaln_lora is not None:
            e = e + adaln_lora[..., :2 * self.hidden]
        shift, scale = jnp.split(e.astype(jnp.float32), 2, axis=-1)
        x = (_ln(x) * (1 + scale) + shift).astype(x.dtype)
        return self.proj_out(x)


class Cosmos25CrossattnProj(nnx.Module):
    """Linear + GELU over full-concat Reason1 embeds (reference :806)."""

    def __init__(self, in_dim: int, out_dim: int, *, param_dtype,
                 rngs: nnx.Rngs):
        self.proj = Linear(in_dim, out_dim, bias=True,
                           param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        return jax.nn.gelu(self.proj(x))


class Cosmos25Transformer3DModel(nnx.Module):
    """Top-level (reference :733-967); NCDHW at the boundary.

    ``timestep`` is expected in the reference's model units (t/1000 done
    by the pipeline); per-frame 2D timesteps are supported.
    """

    def __init__(self, config: Cosmos25ArchConfig, *,
                 param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        inner = config.hidden_size
        in_ch = config.in_channels + 1  # + condition mask
        if config.concat_padding_mask:
            in_ch += 1
        self.patch_embed = CosmosPatchEmbed(in_ch, inner,
                                            config.patch_size, **kw)
        self.time_embed = Cosmos25Embedding(inner, inner,
                                            config.use_adaln_lora, **kw)
        self.crossattn_proj = (Cosmos25CrossattnProj(
            config.crossattn_proj_in_channels, config.text_embed_dim, **kw)
            if config.use_crossattn_projection else None)
        self.transformer_blocks = nnx.List([
            Cosmos25TransformerBlock(config.num_attention_heads,
                                     config.attention_head_dim,
                                     config.text_embed_dim,
                                     config.mlp_ratio,
                                     config.adaln_lora_dim,
                                     config.use_adaln_lora, **kw)
            for _ in range(config.num_layers)
        ])
        self.final_layer = Cosmos25FinalLayer(inner, config.out_channels,
                                              config.patch_size,
                                              config.adaln_lora_dim,
                                              config.use_adaln_lora, **kw)
        self.out_channels = config.out_channels
        self.gradient_checkpointing = False

    def __call__(self, hidden_states: Array, encoder_hidden_states,
                 timestep: Array, fps: float | None = None,
                 condition_mask: Array | None = None,
                 padding_mask: Array | None = None, **kwargs) -> Array:
        cfg = self.config
        if isinstance(encoder_hidden_states, (list, tuple)):
            encoder_hidden_states = encoder_hidden_states[0]
        b, c, t, h, w = hidden_states.shape
        if condition_mask is None:
            condition_mask = jnp.zeros((b, 1, t, h, w),
                                       hidden_states.dtype)
        hidden_states = jnp.concatenate(
            [hidden_states, condition_mask.astype(hidden_states.dtype)],
            axis=1)
        if cfg.concat_padding_mask:
            if padding_mask is None:
                padding_mask = jnp.ones((b, 1, h, w), hidden_states.dtype)
            pm = jnp.broadcast_to(
                padding_mask.astype(hidden_states.dtype)[:, :, None],
                (b, 1, t, h, w))
            hidden_states = jnp.concatenate([hidden_states, pm], axis=1)

        pt, ph, pw = cfg.patch_size
        tt, th, tw = t // pt, h // ph, w // pw
        x = self.patch_embed(hidden_states)  # [B, S, D]

        cos, sin = cosmos_rope(
            cfg.attention_head_dim, (tt, th, tw), tuple(cfg.rope_scale),
            fps=(float(fps) if (cfg.rope_enable_fps_modulation
                                and fps is not None) else None))

        if timestep.ndim == 1:
            timestep = timestep[:, None]
        embedded_timestep, adaln_lora = self.time_embed(
            timestep.astype(jnp.float32), x.dtype)
        # per-frame mods -> per-token (frames t-major in token order)
        t_frames = embedded_timestep.shape[1]
        if t_frames > 1:
            reps = (tt * th * tw) // t_frames
            expand = lambda m: jnp.repeat(m, reps, axis=1)  # noqa: E731
        else:
            expand = lambda m: m  # broadcast [B, 1, D]  # noqa: E731
        embedded_timestep = expand(embedded_timestep)
        if adaln_lora is not None:
            adaln_lora = expand(adaln_lora)

        context = encoder_hidden_states.astype(x.dtype)
        if self.crossattn_proj is not None:
            context = self.crossattn_proj(context)

        x, orig_len = shard_seq(x)
        from fastvideo_tpu.parallel import pad_rope_to, pad_tokens_to
        cos, sin = pad_rope_to(cos, sin, x.shape[1])
        if embedded_timestep.shape[1] > 1:
            embedded_timestep = pad_tokens_to(embedded_timestep, x.shape[1])
        if adaln_lora is not None and adaln_lora.shape[1] > 1:
            adaln_lora = pad_tokens_to(adaln_lora, x.shape[1])
        for block in self.transformer_blocks:
            if self.gradient_checkpointing:
                x = jax.checkpoint(
                    lambda xx, ctx, et, al, blk=block: blk(
                        xx, ctx, et, al, (cos, sin)))(
                            x, context, embedded_timestep, adaln_lora)
            else:
                x = block(x, context, embedded_timestep, adaln_lora,
                          (cos, sin))
        x = unshard_seq(x, orig_len)

        x = self.final_layer(x, embedded_timestep, adaln_lora)
        # feature order (pt, ph, pw, C) (reference :954-960 unflatten)
        x = x.reshape(b, tt, th, tw, pt, ph, pw, self.out_channels)
        x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
        return x.reshape(b, self.out_channels, t, h, w)


EntryClass = Cosmos25Transformer3DModel
