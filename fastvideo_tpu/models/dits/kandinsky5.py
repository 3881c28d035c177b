"""Kandinsky-5.0 video transformer, TPU-native.

Behavioral reference: /root/reference/fastvideo/models/dits/kandinsky5.py
(:125-833): a text-encoder-transformer (2 blocks refining Qwen2.5-VL
embeddings under time modulation) feeding a 32-block visual decoder stack
(self-attn with 3D rope + cross-attn to the refined text + FF, all driven
by 9-param modulation), CLIP pooled text added into the time embedding,
sum(axes_dims) head size, zero-init modulations, and an out layer with
2-param modulation. ``attention_type="nabla"`` checkpoints route visual
self-attention through the NABLA backend (ops/nabla.py).

The reference's 2x2 rotation-matrix rope equals the interleaved
rotate-half form of layers/rotary.py (same freqs: theta^-(2i/d)).
I/O is NCDHW at the boundary (the repo-wide pipeline convention; the
reference uses channels-last BTHWC internally).
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
from fastvideo_tpu.layers.embeddings import timestep_embedding
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.mlp import MLP
from fastvideo_tpu.layers.norm import RMSNorm
from fastvideo_tpu.layers.rotary import (apply_rotary_emb,
                                         get_nd_rotary_pos_embed)
from fastvideo_tpu.models.dits.sd3 import _ln
from fastvideo_tpu.parallel import shard_seq, unshard_seq

Array = jax.Array

KANDINSKY5_PARAM_NAMES_MAPPING: dict[str, str] = {
    r"^(.*feed_forward)\.in_layer\.(weight|bias)$": r"\1.mlp.fc_in.\2",
    r"^(.*feed_forward)\.out_layer\.(weight|bias)$": r"\1.mlp.fc_out.\2",
}


@dataclasses.dataclass
class Kandinsky5ArchConfig(DiTArchConfig):
    in_visual_dim: int = 4
    in_text_dim: int = 3584
    in_text_dim2: int = 768
    time_dim: int = 512
    out_visual_dim: int = 4
    patch_size: tuple[int, int, int] = (1, 2, 2)
    model_dim: int = 2048
    ff_dim: int = 5120
    num_text_blocks: int = 2
    num_visual_blocks: int = 32
    axes_dims: tuple[int, int, int] = (16, 24, 24)
    visual_cond: bool = False
    attention_type: str = "regular"
    rope_theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        return sum(self.axes_dims)

    @property
    def hidden_size(self) -> int:
        return self.model_dim

    @property
    def num_attention_heads(self) -> int:
        return self.model_dim // self.head_dim

    @property
    def num_channels_latents(self) -> int:
        return self.in_visual_dim

    @property
    def patch_size_thw(self) -> tuple[int, int, int]:
        return tuple(self.patch_size)


@dataclasses.dataclass
class Kandinsky5Config(ModelConfig):
    arch_config: Kandinsky5ArchConfig = dataclasses.field(
        default_factory=Kandinsky5ArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(KANDINSKY5_PARAM_NAMES_MAPPING))


class Kandinsky5TimeEmbeddings(nnx.Module):
    """[cos|sin](outer(t, freqs(model_dim/2))) -> 2-layer MLP to time_dim
    (reference :125-146)."""

    def __init__(self, model_dim: int, time_dim: int, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.model_dim = model_dim
        self.in_layer = Linear(model_dim, time_dim, **kw)
        self.out_layer = Linear(time_dim, time_dim, **kw)

    def __call__(self, t: Array) -> Array:
        emb = timestep_embedding(t.astype(jnp.float32), self.model_dim)
        emb = emb.astype(self.in_layer.kernel.value.dtype)
        return self.out_layer(jax.nn.silu(self.in_layer(emb)))


class Kandinsky5TextEmbeddings(nnx.Module):
    def __init__(self, text_dim: int, model_dim: int, *, param_dtype,
                 rngs: nnx.Rngs):
        self.in_layer = Linear(text_dim, model_dim, param_dtype=param_dtype,
                               rngs=rngs)
        self.norm = AffineLayerNorm(model_dim, param_dtype=param_dtype,
                                    rngs=rngs)

    def __call__(self, x: Array) -> Array:
        return self.norm(self.in_layer(x))


class AffineLayerNorm(nnx.Module):
    """LayerNorm with weight+bias, fp32 stats."""

    def __init__(self, dim: int, eps: float = 1e-5, *, param_dtype,
                 rngs: nnx.Rngs):
        del rngs
        self.eps = eps
        self.weight = nnx.Param(jnp.ones((dim,), param_dtype))
        self.bias = nnx.Param(jnp.zeros((dim,), param_dtype))

    def __call__(self, x: Array) -> Array:
        out = _ln(x, self.eps)
        out = (out * self.weight.value.astype(jnp.float32) +
               self.bias.value.astype(jnp.float32))
        return out.astype(x.dtype)


class Kandinsky5Modulation(nnx.Module):
    def __init__(self, time_dim: int, model_dim: int, num_params: int, *,
                 param_dtype, rngs: nnx.Rngs):
        self.num_params = num_params
        self.out_layer = Linear(time_dim, num_params * model_dim,
                                param_dtype=param_dtype, rngs=rngs)

    def __call__(self, temb: Array) -> tuple[Array, ...]:
        mod = self.out_layer(jax.nn.silu(temb))[:, None]  # [B, 1, n*D]
        return tuple(p.astype(jnp.float32)
                     for p in jnp.split(mod, self.num_params, axis=-1))


class Kandinsky5Attention(nnx.Module):
    """q/k/v/out with per-head RMS qk norm (reference :280-425)."""

    def __init__(self, dim: int, head_dim: int, *, distributed: bool,
                 nabla: bool = False, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.num_heads = dim // head_dim
        self.head_dim = head_dim
        self.to_query = Linear(dim, dim, **kw)
        self.to_key = Linear(dim, dim, **kw)
        self.to_value = Linear(dim, dim, **kw)
        self.query_norm = RMSNorm(head_dim, **kw)
        self.key_norm = RMSNorm(head_dim, **kw)
        self.out_layer = Linear(dim, dim, **kw)
        supported = ("NABLA_ATTN",) if nabla else None
        attn_cls = DistributedAttention if distributed else LocalAttention
        if nabla:
            self.attn = DistributedAttention(self.num_heads, head_dim,
                                             supported_backends=supported)
        else:
            self.attn = attn_cls(self.num_heads, head_dim)
        self.distributed = distributed or nabla

    def _heads(self, x: Array) -> Array:
        b, s, _ = x.shape
        return x.reshape(b, s, self.num_heads, self.head_dim)

    def __call__(self, x: Array, context: Array | None = None,
                 freqs_cis: tuple[Array, Array] | None = None) -> Array:
        b, s, _ = x.shape
        kv_src = context if context is not None else x
        q = self.query_norm(self._heads(self.to_query(x))).astype(x.dtype)
        k = self.key_norm(self._heads(self.to_key(kv_src))).astype(x.dtype)
        v = self._heads(self.to_value(kv_src))
        if self.distributed:
            out = self.attn(q, k, v, freqs_cis=freqs_cis)
        else:
            if freqs_cis is not None:
                cos, sin = freqs_cis
                q = apply_rotary_emb(q, cos, sin)
                k = apply_rotary_emb(k, cos, sin)
            out = self.attn(q, k, v)
        return self.out_layer(out.reshape(b, s, -1))


class Kandinsky5FeedForward(nnx.Module):
    def __init__(self, dim: int, ff_dim: int, *, param_dtype,
                 rngs: nnx.Rngs):
        self.mlp = MLP(dim, ff_dim, dim, bias=False, act_type="gelu",
                       param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        return self.mlp(x)


def _mod3(params: Array) -> tuple[Array, Array, Array]:
    return tuple(jnp.split(params, 3, axis=-1))


class Kandinsky5TransformerEncoderBlock(nnx.Module):
    """Text-refiner block (reference :472-530)."""

    def __init__(self, model_dim: int, time_dim: int, ff_dim: int,
                 head_dim: int, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.text_modulation = Kandinsky5Modulation(time_dim, model_dim, 6,
                                                    **kw)
        self.self_attention = Kandinsky5Attention(model_dim, head_dim,
                                                  distributed=False, **kw)
        self.feed_forward = Kandinsky5FeedForward(model_dim, ff_dim, **kw)

    def __call__(self, x: Array, temb: Array, freqs_cis) -> Array:
        mods = self.text_modulation(temb)
        shift, scale, gate = mods[0], mods[1], mods[2]
        out = ((_ln(x, 1e-5) * (1 + scale) + shift).astype(x.dtype))
        out = self.self_attention(out, freqs_cis=freqs_cis)
        x = (x.astype(jnp.float32) + gate * out.astype(jnp.float32)).astype(
            x.dtype)
        f_shift, f_scale, f_gate = mods[3], mods[4], mods[5]
        out = ((_ln(x, 1e-5) * (1 + f_scale) + f_shift).astype(x.dtype))
        out = self.feed_forward(out)
        return (x.astype(jnp.float32) +
                f_gate * out.astype(jnp.float32)).astype(x.dtype)


class Kandinsky5TransformerDecoderBlock(nnx.Module):
    """Visual block: self-attn + cross-attn + FF (reference :532-633)."""

    def __init__(self, model_dim: int, time_dim: int, ff_dim: int,
                 head_dim: int, nabla: bool, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.visual_modulation = Kandinsky5Modulation(time_dim, model_dim, 9,
                                                      **kw)
        self.self_attention = Kandinsky5Attention(model_dim, head_dim,
                                                  distributed=True,
                                                  nabla=nabla, **kw)
        self.cross_attention = Kandinsky5Attention(model_dim, head_dim,
                                                   distributed=False, **kw)
        self.feed_forward = Kandinsky5FeedForward(model_dim, ff_dim, **kw)

    def __call__(self, x: Array, text: Array, temb: Array,
                 freqs_cis) -> Array:
        mods = self.visual_modulation(temb)

        def res(x, out, gate):
            return (x.astype(jnp.float32) +
                    gate * out.astype(jnp.float32)).astype(x.dtype)

        out = (_ln(x, 1e-5) * (1 + mods[1]) + mods[0]).astype(x.dtype)
        x = res(x, self.self_attention(out, freqs_cis=freqs_cis), mods[2])
        out = (_ln(x, 1e-5) * (1 + mods[4]) + mods[3]).astype(x.dtype)
        x = res(x, self.cross_attention(out, context=text), mods[5])
        out = (_ln(x, 1e-5) * (1 + mods[7]) + mods[6]).astype(x.dtype)
        return res(x, self.feed_forward(out), mods[8])


class Kandinsky5OutLayer(nnx.Module):
    def __init__(self, model_dim: int, time_dim: int, visual_dim: int,
                 patch_size: tuple[int, int, int], *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.patch_size = tuple(patch_size)
        self.modulation = Kandinsky5Modulation(time_dim, model_dim, 2, **kw)
        self.out_layer = Linear(model_dim,
                                math.prod(patch_size) * visual_dim, **kw)
        self.visual_dim = visual_dim

    def __call__(self, x: Array, temb: Array,
                 grid: tuple[int, int, int]) -> Array:
        shift, scale = self.modulation(temb)
        x = (_ln(x, 1e-5) * (1 + scale) + shift).astype(x.dtype)
        x = self.out_layer(x)
        b = x.shape[0]
        t, h, w = grid
        pt, ph, pw = self.patch_size
        c = self.visual_dim
        # token (t,h,w)-major; feature order (C, pt, ph, pw)
        # (reference :446-470 view/permute chain, channels-last output)
        x = x.reshape(b, t, h, w, c, pt, ph, pw)
        x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
        return x.reshape(b, t * pt, h * ph, w * pw, c)


class Kandinsky5Transformer3DModel(nnx.Module):
    """Top-level (reference :640-800); NCDHW at the boundary."""

    def __init__(self, config: Kandinsky5ArchConfig, *,
                 param_dtype: jnp.dtype = jnp.bfloat16,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        arch = config
        head_dim = arch.head_dim
        visual_in = (2 * arch.in_visual_dim + 1
                     if arch.visual_cond else arch.in_visual_dim)
        self.time_embeddings = Kandinsky5TimeEmbeddings(
            arch.model_dim, arch.time_dim, **kw)
        self.text_embeddings = Kandinsky5TextEmbeddings(
            arch.in_text_dim, arch.model_dim, **kw)
        self.pooled_text_embeddings = Kandinsky5TextEmbeddings(
            arch.in_text_dim2, arch.time_dim, **kw)
        self.visual_embeddings = Linear(
            math.prod(arch.patch_size) * visual_in, arch.model_dim, **kw)
        self.text_transformer_blocks = nnx.List([
            Kandinsky5TransformerEncoderBlock(arch.model_dim, arch.time_dim,
                                              arch.ff_dim, head_dim, **kw)
            for _ in range(arch.num_text_blocks)
        ])
        self.visual_transformer_blocks = nnx.List([
            Kandinsky5TransformerDecoderBlock(
                arch.model_dim, arch.time_dim, arch.ff_dim, head_dim,
                nabla=(arch.attention_type == "nabla"), **kw)
            for _ in range(arch.num_visual_blocks)
        ])
        self.out_layer = Kandinsky5OutLayer(arch.model_dim, arch.time_dim,
                                            arch.out_visual_dim,
                                            arch.patch_size, **kw)
        self.gradient_checkpointing = False
        self.out_channels = arch.out_visual_dim

    def __call__(self, hidden_states: Array, encoder_hidden_states,
                 timestep: Array, pooled_projections: Array | None = None,
                 **kwargs) -> Array:
        cfg = self.config
        if isinstance(encoder_hidden_states, (list, tuple)):
            if pooled_projections is None and len(encoder_hidden_states) > 1:
                pooled_projections = encoder_hidden_states[1]
            encoder_hidden_states = encoder_hidden_states[0]
        assert pooled_projections is not None, \
            "kandinsky5 needs CLIP pooled projections"

        b, c, t, h, w = hidden_states.shape
        pt, ph, pw = cfg.patch_size
        tt, th, tw = t // pt, h // ph, w // pw
        # NCDHW -> tokens with (pt, ph, pw, C) feature order, matching
        # reference Kandinsky5VisualEmbeddings' channels-last permute
        x = hidden_states.transpose(0, 2, 3, 4, 1)  # [B, T, H, W, C]
        x = x.reshape(b, tt, pt, th, ph, tw, pw, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        x = x.reshape(b, tt * th * tw, pt * ph * pw * c)
        visual = self.visual_embeddings(x)

        temb = self.time_embeddings(timestep)
        temb = temb + self.pooled_text_embeddings(
            pooled_projections.astype(temb.dtype))
        text = self.text_embeddings(
            encoder_hidden_states.astype(visual.dtype))

        txt_len = text.shape[1]
        tcos, tsin = get_nd_rotary_pos_embed((cfg.head_dim,), (txt_len,),
                                             cfg.rope_theta)
        text_freqs = (jnp.asarray(tcos), jnp.asarray(tsin))
        for block in self.text_transformer_blocks:
            text = block(text, temb, text_freqs)

        vcos, vsin = get_nd_rotary_pos_embed(tuple(cfg.axes_dims),
                                             (tt, th, tw), cfg.rope_theta)
        visual_freqs = (jnp.asarray(vcos), jnp.asarray(vsin))
        visual, orig_len = shard_seq(visual)
        from fastvideo_tpu.parallel import pad_rope_to
        visual_freqs = pad_rope_to(*visual_freqs, visual.shape[1])
        for block in self.visual_transformer_blocks:
            if self.gradient_checkpointing:
                visual = jax.checkpoint(
                    lambda v, txt, e, blk=block: blk(v, txt, e,
                                                     visual_freqs))(
                                                         visual, text, temb)
            else:
                visual = block(visual, text, temb, visual_freqs)
        visual = unshard_seq(visual, orig_len)

        out = self.out_layer(visual, temb, (tt, th, tw))  # [B,T,H,W,C]
        return out.transpose(0, 4, 1, 2, 3)


EntryClass = Kandinsky5Transformer3DModel
