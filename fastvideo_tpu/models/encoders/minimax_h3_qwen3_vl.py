"""MiniMax-H3 Qwen3-VL conditioner, TPU-native.

Behavioral reference:
/root/reference/fastvideo/models/encoders/minimax_h3_qwen3_vl.py (:21-704):
a Qwen3-VL body without the LM head — a GQA decoder with per-head q/k
RMSNorm and *interleaved multimodal* rope (t/h/w frequencies interleaved by
``mrope_section``), plus a windowless ViT vision tower with bilinear
position-embedding interpolation, 2-axis rotary embeddings, a patch merger,
and DeepStack side-features injected into the first language layers at
visual token positions. MiniMax-H3 reads ``hidden_states[50]`` as the
conditioning stream.

TPU shape: rope/position/index arithmetic is host-side numpy (static per
request shape); the transformer stacks are dense jnp — text attention is an
exact causal einsum (conditioning sequences are ~1k tokens; flash adds
nothing at that size), the vision tower runs per-image SDPA chunks.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.configs.models.base import ArchConfig, ModelConfig
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.norm import FP32LayerNorm, RMSNorm
from fastvideo_tpu.models.encoders.t5 import BaseEncoderOutput, Embedding

Array = jax.Array


@dataclasses.dataclass
class MiniMaxH3Qwen3VLArchConfig(ArchConfig):
    """Reference: configs/models/encoders/minimax_h3_qwen3_vl.py."""

    vocab_size: int = 151936
    hidden_size: int = 5120
    intermediate_size: int = 25600
    num_hidden_layers: int = 64
    num_attention_heads: int = 64
    num_key_value_heads: int = 8
    head_dim: int = 128
    text_len: int = 1024
    rms_norm_eps: float = 1e-6
    attention_bias: bool = False
    rope_theta: float = 5000000.0
    mrope_section: tuple[int, int, int] = (24, 20, 20)

    vision_start_token_id: int = 151652
    vision_end_token_id: int = 151653
    image_token_id: int = 151655
    video_token_id: int = 151656

    vision_depth: int = 27
    vision_hidden_size: int = 1152
    vision_intermediate_size: int = 4304
    vision_num_heads: int = 16
    vision_in_channels: int = 3
    vision_patch_size: int = 16
    vision_spatial_merge_size: int = 2
    vision_temporal_patch_size: int = 2
    vision_out_hidden_size: int = 5120
    vision_num_position_embeddings: int = 2304
    vision_deepstack_visual_indexes: tuple[int, ...] = (8, 16, 24)


def _rotate_half(x: Array) -> Array:
    first, second = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-second, first], axis=-1)


def mrope_cos_sin(position_ids: np.ndarray, head_dim: int, theta: float,
                  mrope_section: tuple[int, int, int]
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Interleaved t/h/w rope (reference :26-51).

    position_ids [3, B, S] -> cos/sin [B, S, head_dim]."""
    inv_freq = 1.0 / theta ** (np.arange(0, head_dim, 2, np.float32) /
                               head_dim)
    freqs = position_ids[:, :, :, None].astype(np.float32) * inv_freq
    interleaved = freqs[0].copy()
    for axis, offset in ((1, 1), (2, 2)):
        stop = mrope_section[axis] * 3
        interleaved[..., offset:stop:3] = freqs[axis][..., offset:stop:3]
    emb = np.concatenate([interleaved, interleaved], axis=-1)
    return np.cos(emb), np.sin(emb)


def get_rope_index(input_ids: np.ndarray,
                   image_grid_thw: np.ndarray | None,
                   video_grid_thw: np.ndarray | None,
                   spatial_merge_size: int, vision_start_token_id: int,
                   image_token_id: int,
                   video_token_id: int) -> np.ndarray:
    """3D multimodal positions (reference :537-577). Host-side numpy."""
    if image_grid_thw is None and video_grid_thw is None:
        s = input_ids.shape[1]
        return np.broadcast_to(np.arange(s)[None, None],
                               (3, input_ids.shape[0], s)).copy()
    if video_grid_thw is not None:
        video_grid_thw = np.repeat(video_grid_thw, video_grid_thw[:, 0],
                                   axis=0).copy()
        video_grid_thw[:, 0] = 1
    position_ids = np.ones((3, input_ids.shape[0], input_ids.shape[1]),
                           np.int64)
    image_index = video_index = 0
    merge = spatial_merge_size
    for bi, sequence in enumerate(input_ids):
        tokens = sequence.tolist()
        starts = np.argwhere(sequence == vision_start_token_id).reshape(-1)
        vision_tokens = sequence[starts + 1] if len(starts) else np.array([])
        image_count = int((vision_tokens == image_token_id).sum())
        video_count = int((vision_tokens == video_token_id).sum())
        pieces = []
        start = 0
        remaining_images, remaining_videos = image_count, video_count
        for _ in range(image_count + video_count):
            image_end = (tokens.index(image_token_id, start)
                         if remaining_images else len(tokens) + 1)
            video_end = (tokens.index(video_token_id, start)
                         if remaining_videos else len(tokens) + 1)
            if image_end < video_end:
                f, h, w = (int(v) for v in image_grid_thw[image_index])
                image_index += 1
                remaining_images -= 1
                end = image_end
            else:
                f, h, w = (int(v) for v in video_grid_thw[video_index])
                video_index += 1
                remaining_videos -= 1
                end = video_end
            gf, gh, gw = f, h // merge, w // merge
            text_length = end - start
            offset = int(pieces[-1].max()) + 1 if pieces else 0
            pieces.append(
                np.broadcast_to(np.arange(text_length)[None],
                                (3, text_length)) + offset)
            temporal = np.repeat(np.arange(gf), gh * gw)
            rows = np.tile(np.repeat(np.arange(gh), gw), gf)
            cols = np.tile(np.arange(gw), gf * gh)
            pieces.append(np.stack([temporal, rows, cols]) + text_length +
                          offset)
            start = end + gf * gh * gw
        if start < len(tokens):
            offset = int(pieces[-1].max()) + 1 if pieces else 0
            n = len(tokens) - start
            pieces.append(np.broadcast_to(np.arange(n)[None], (3, n)) +
                          offset)
        position_ids[:, bi] = np.concatenate(pieces, axis=1)
    return position_ids


class MMQwen3VLTextAttention(nnx.Module):
    """GQA + per-head q/k RMSNorm + mrope (reference :54-157)."""

    def __init__(self, cfg: MiniMaxH3Qwen3VLArchConfig, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.num_heads = cfg.num_attention_heads
        self.num_kv_heads = cfg.num_key_value_heads
        self.head_dim = cfg.head_dim
        bias = cfg.attention_bias
        self.q_proj = Linear(cfg.hidden_size,
                             self.num_heads * self.head_dim, bias=bias, **kw)
        self.k_proj = Linear(cfg.hidden_size,
                             self.num_kv_heads * self.head_dim, bias=bias,
                             **kw)
        self.v_proj = Linear(cfg.hidden_size,
                             self.num_kv_heads * self.head_dim, bias=bias,
                             **kw)
        self.o_proj = Linear(self.num_heads * self.head_dim,
                             cfg.hidden_size, bias=bias, **kw)
        self.q_norm = RMSNorm(self.head_dim, cfg.rms_norm_eps, **kw)
        self.k_norm = RMSNorm(self.head_dim, cfg.rms_norm_eps, **kw)

    def __call__(self, x: Array, cos: Array, sin: Array,
                 mask_bias: Array | None) -> Array:
        b, s, _ = x.shape
        q = self.q_norm(self.q_proj(x).reshape(b, s, self.num_heads,
                                               self.head_dim))
        k = self.k_norm(self.k_proj(x).reshape(b, s, self.num_kv_heads,
                                               self.head_dim))
        v = self.v_proj(x).reshape(b, s, self.num_kv_heads, self.head_dim)
        cos_b = cos.astype(q.dtype)[:, :, None]
        sin_b = sin.astype(q.dtype)[:, :, None]
        q = q * cos_b + _rotate_half(q) * sin_b
        k = k * cos_b + _rotate_half(k) * sin_b
        groups = self.num_heads // self.num_kv_heads
        if groups > 1:
            k = jnp.repeat(k, groups, axis=2)
            v = jnp.repeat(v, groups, axis=2)
        scale = self.head_dim ** -0.5
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        causal = jnp.tril(jnp.ones((s, s), bool))
        scores = jnp.where(causal[None, None], scores,
                           jnp.finfo(scores.dtype).min)
        if mask_bias is not None:
            scores = scores + mask_bias
        attn = jax.nn.softmax(scores.astype(jnp.float32),
                              axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, s, -1)
        return self.o_proj(out)


class MMQwen3VLTextMLP(nnx.Module):
    def __init__(self, cfg: MiniMaxH3Qwen3VLArchConfig, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.gate_proj = Linear(cfg.hidden_size, cfg.intermediate_size,
                                bias=False, **kw)
        self.up_proj = Linear(cfg.hidden_size, cfg.intermediate_size,
                              bias=False, **kw)
        self.down_proj = Linear(cfg.intermediate_size, cfg.hidden_size,
                                bias=False, **kw)

    def __call__(self, x: Array) -> Array:
        return self.down_proj(jax.nn.silu(self.gate_proj(x)) *
                              self.up_proj(x))


class MMQwen3VLTextDecoderLayer(nnx.Module):
    def __init__(self, cfg: MiniMaxH3Qwen3VLArchConfig, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.input_layernorm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps,
                                       **kw)
        self.self_attn = MMQwen3VLTextAttention(cfg, **kw)
        self.post_attention_layernorm = RMSNorm(cfg.hidden_size,
                                                cfg.rms_norm_eps, **kw)
        self.mlp = MMQwen3VLTextMLP(cfg, **kw)

    def __call__(self, x: Array, cos: Array, sin: Array,
                 mask_bias: Array | None) -> Array:
        x = x + self.self_attn(self.input_layernorm(x), cos, sin, mask_bias)
        return x + self.mlp(self.post_attention_layernorm(x))


class MMQwen3VLVisionMLP(nnx.Module):
    def __init__(self, cfg: MiniMaxH3Qwen3VLArchConfig, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.linear_fc1 = Linear(cfg.vision_hidden_size,
                                 cfg.vision_intermediate_size, **kw)
        self.linear_fc2 = Linear(cfg.vision_intermediate_size,
                                 cfg.vision_hidden_size, **kw)

    def __call__(self, x: Array) -> Array:
        return self.linear_fc2(jax.nn.gelu(self.linear_fc1(x),
                                           approximate=True))


class MMQwen3VLVisionAttention(nnx.Module):
    """Per-image full attention chunks with 2-axis rope
    (reference :326-366)."""

    def __init__(self, cfg: MiniMaxH3Qwen3VLArchConfig, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.num_heads = cfg.vision_num_heads
        self.head_dim = cfg.vision_hidden_size // cfg.vision_num_heads
        self.qkv = Linear(cfg.vision_hidden_size,
                          cfg.vision_hidden_size * 3, **kw)
        self.proj = Linear(cfg.vision_hidden_size, cfg.vision_hidden_size,
                           **kw)

    def __call__(self, x: Array, seq_lens: list[int], cos: Array,
                 sin: Array) -> Array:
        s = x.shape[0]
        qkv = self.qkv(x).reshape(s, 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        cos_f = cos[:, None].astype(jnp.float32)
        sin_f = sin[:, None].astype(jnp.float32)
        q = (q.astype(jnp.float32) * cos_f +
             _rotate_half(q.astype(jnp.float32)) * sin_f).astype(q.dtype)
        k = (k.astype(jnp.float32) * cos_f +
             _rotate_half(k.astype(jnp.float32)) * sin_f).astype(k.dtype)
        outs = []
        offset = 0
        scale = self.head_dim ** -0.5
        for n in seq_lens:
            qc = q[offset:offset + n]
            kc = k[offset:offset + n]
            vc = v[offset:offset + n]
            scores = jnp.einsum("qhd,khd->hqk", qc, kc) * scale
            attn = jax.nn.softmax(scores.astype(jnp.float32),
                                  axis=-1).astype(qc.dtype)
            outs.append(jnp.einsum("hqk,khd->qhd", attn, vc))
            offset += n
        return self.proj(jnp.concatenate(outs).reshape(s, -1))


class MMQwen3VLVisionBlock(nnx.Module):
    def __init__(self, cfg: MiniMaxH3Qwen3VLArchConfig, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm1 = FP32LayerNorm(cfg.vision_hidden_size, eps=1e-6, **kw)
        self.norm2 = FP32LayerNorm(cfg.vision_hidden_size, eps=1e-6, **kw)
        self.attn = MMQwen3VLVisionAttention(cfg, **kw)
        self.mlp = MMQwen3VLVisionMLP(cfg, **kw)

    def __call__(self, x: Array, seq_lens: list[int], cos: Array,
                 sin: Array) -> Array:
        x = x + self.attn(self.norm1(x), seq_lens, cos, sin)
        return x + self.mlp(self.norm2(x))


class MMQwen3VLVisionPatchMerger(nnx.Module):
    """Reference :297-317."""

    def __init__(self, cfg: MiniMaxH3Qwen3VLArchConfig,
                 use_postshuffle_norm: bool, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.hidden_size = (cfg.vision_hidden_size *
                            cfg.vision_spatial_merge_size ** 2)
        self.use_postshuffle_norm = use_postshuffle_norm
        norm_size = (self.hidden_size if use_postshuffle_norm
                     else cfg.vision_hidden_size)
        self.norm = FP32LayerNorm(norm_size, eps=1e-6, **kw)
        self.linear_fc1 = Linear(self.hidden_size, self.hidden_size, **kw)
        self.linear_fc2 = Linear(self.hidden_size,
                                 cfg.vision_out_hidden_size, **kw)

    def __call__(self, x: Array) -> Array:
        if self.use_postshuffle_norm:
            x = self.norm(x.reshape(-1, self.hidden_size))
        else:
            x = self.norm(x).reshape(-1, self.hidden_size)
        return self.linear_fc2(jax.nn.gelu(self.linear_fc1(x),
                                           approximate=False))


class MMQwen3VLVisionModel(nnx.Module):
    """Reference :388-485."""

    def __init__(self, cfg: MiniMaxH3Qwen3VLArchConfig, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.cfg = cfg
        self.merge = cfg.vision_spatial_merge_size
        patch_dim = (cfg.vision_in_channels * cfg.vision_temporal_patch_size
                     * cfg.vision_patch_size ** 2)
        self.patch_embed_proj = Linear(patch_dim, cfg.vision_hidden_size,
                                       **kw)
        self.pos_embed = Embedding(cfg.vision_num_position_embeddings,
                                   cfg.vision_hidden_size, **kw)
        self.num_grid_per_side = int(
            cfg.vision_num_position_embeddings ** 0.5)
        self.head_dim = cfg.vision_hidden_size // cfg.vision_num_heads
        self.blocks = nnx.List([
            MMQwen3VLVisionBlock(cfg, **kw) for _ in range(cfg.vision_depth)
        ])
        self.merger = MMQwen3VLVisionPatchMerger(cfg, False, **kw)
        self.deepstack_visual_indexes = tuple(
            cfg.vision_deepstack_visual_indexes)
        self.deepstack_merger_list = nnx.List([
            MMQwen3VLVisionPatchMerger(cfg, True, **kw)
            for _ in self.deepstack_visual_indexes
        ])

    def _rotary_cos_sin(self,
                        grid_thw: np.ndarray) -> tuple[Array, Array]:
        dim = self.head_dim // 2
        inv_freq = 1.0 / 10000.0 ** (np.arange(0, dim, 2, np.float32) / dim)
        max_hw = int(grid_thw[:, 1:].max())
        table = np.outer(np.arange(max_hw, dtype=np.float32), inv_freq)
        pos_list = []
        m = self.merge
        for f, h, w in grid_thw:
            f, h, w = int(f), int(h), int(w)
            mh, mw = h // m, w // m
            rows = (np.arange(mh)[:, None, None, None] * m +
                    np.arange(m)[None, None, :, None])
            cols = (np.arange(mw)[None, :, None, None] * m +
                    np.arange(m)[None, None, None, :])
            rows = np.broadcast_to(rows, (mh, mw, m, m)).reshape(-1)
            cols = np.broadcast_to(cols, (mh, mw, m, m)).reshape(-1)
            coords = np.tile(np.stack([rows, cols], -1), (f, 1))
            pos_list.append(coords)
        pos = np.concatenate(pos_list)
        rotary = table[pos].reshape(pos.shape[0], -1)
        emb = np.concatenate([rotary, rotary], axis=-1)
        return jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))

    def _interp_pos_embed(self, grid_thw: np.ndarray) -> Array:
        side = self.num_grid_per_side
        outs = []
        for f, h, w in grid_thw:
            f, h, w = int(f), int(h), int(w)
            hp = np.linspace(0, side - 1, h, dtype=np.float32)
            wp = np.linspace(0, side - 1, w, dtype=np.float32)
            hf = hp.astype(np.int32)
            wf = wp.astype(np.int32)
            hc = np.clip(hf + 1, None, side - 1)
            wc = np.clip(wf + 1, None, side - 1)
            dh = hp - hf
            dw = wp - wf
            idx = np.stack([
                (hf[:, None] * side + wf[None]).reshape(-1),
                (hf[:, None] * side + wc[None]).reshape(-1),
                (hc[:, None] * side + wf[None]).reshape(-1),
                (hc[:, None] * side + wc[None]).reshape(-1),
            ])
            wgt = np.stack([
                ((1 - dh)[:, None] * (1 - dw)[None]).reshape(-1),
                ((1 - dh)[:, None] * dw[None]).reshape(-1),
                (dh[:, None] * (1 - dw)[None]).reshape(-1),
                (dh[:, None] * dw[None]).reshape(-1),
            ])
            table = self.pos_embed.weight.value
            emb = (table[jnp.asarray(idx)] *
                   jnp.asarray(wgt, table.dtype)[:, :, None]).sum(0)
            m = self.merge
            emb = jnp.tile(emb, (f, 1)).reshape(f, h // m, m, w // m, m, -1)
            emb = emb.transpose(0, 1, 3, 2, 4, 5).reshape(
                -1, emb.shape[-1])
            outs.append(emb)
        return jnp.concatenate(outs)

    def __call__(self, pixels: Array, grid_thw: np.ndarray
                 ) -> tuple[Array, list[Array]]:
        cfg = self.cfg
        patch_dim = (cfg.vision_in_channels * cfg.vision_temporal_patch_size
                     * cfg.vision_patch_size ** 2)
        x = self.patch_embed_proj(pixels.reshape(-1, patch_dim))
        x = x + self._interp_pos_embed(grid_thw).astype(x.dtype)
        cos, sin = self._rotary_cos_sin(grid_thw)
        seq_lens = [int(h) * int(w) for f, h, w in grid_thw
                    for _ in range(int(f))]
        deepstack = []
        for i, block in enumerate(self.blocks):
            x = block(x, seq_lens, cos, sin)
            if i in self.deepstack_visual_indexes:
                j = self.deepstack_visual_indexes.index(i)
                deepstack.append(self.deepstack_merger_list[j](x))
        return self.merger(x), deepstack


class MMQwen3VLLanguageModel(nnx.Module):
    """Reference :217-263."""

    def __init__(self, cfg: MiniMaxH3Qwen3VLArchConfig, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.embed_tokens = Embedding(cfg.vocab_size, cfg.hidden_size, **kw)
        self.layers = nnx.List([
            MMQwen3VLTextDecoderLayer(cfg, **kw)
            for _ in range(cfg.num_hidden_layers)
        ])
        self.norm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, **kw)

    def __call__(self, inputs_embeds: Array, cos: Array, sin: Array,
                 mask_bias: Array | None, output_hidden_states: bool,
                 visual_mask: np.ndarray | None,
                 deepstack: list[Array] | None) -> BaseEncoderOutput:
        x = inputs_embeds
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layers):
            if all_hidden is not None:
                all_hidden.append(x)
            x = layer(x, cos, sin, mask_bias)
            if deepstack is not None and i < len(deepstack):
                if visual_mask is None:
                    raise ValueError("DeepStack features need visual "
                                     "positions")
                idx = jnp.asarray(np.argwhere(
                    visual_mask.reshape(-1)).reshape(-1))
                b, s, c = x.shape
                flat = x.reshape(b * s, c)
                flat = flat.at[idx].add(deepstack[i].astype(flat.dtype))
                x = flat.reshape(b, s, c)
        x = self.norm(x)
        if all_hidden is not None:
            all_hidden.append(x)
        return BaseEncoderOutput(
            last_hidden_state=x,
            hidden_states=tuple(all_hidden) if all_hidden is not None
            else None)


class MiniMaxH3Qwen3VLConditioner(nnx.Module):
    """Reference :488-689."""

    def __init__(self, config: MiniMaxH3Qwen3VLArchConfig, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.config = config
        self.visual = MMQwen3VLVisionModel(config, **kw)
        self.language_model = MMQwen3VLLanguageModel(config, **kw)

    @property
    def num_hidden_layers(self) -> int:
        return self.config.num_hidden_layers

    def __call__(self, input_ids, attention_mask=None, pixel_values=None,
                 image_grid_thw=None, pixel_values_videos=None,
                 video_grid_thw=None, output_hidden_states: bool = True,
                 **kwargs) -> BaseEncoderOutput:
        cfg = self.config
        input_ids_np = np.asarray(input_ids)
        inputs_embeds = self.language_model.embed_tokens(
            jnp.asarray(input_ids_np))

        image_mask = None
        video_mask = None
        image_deepstack = None
        video_deepstack = None
        if pixel_values is not None:
            image_grid_np = np.asarray(image_grid_thw)
            feats, image_deepstack = self.visual(jnp.asarray(pixel_values),
                                                 image_grid_np)
            image_mask = input_ids_np == cfg.image_token_id
            idx = jnp.asarray(
                np.argwhere(image_mask.reshape(-1)).reshape(-1))
            b, s, c = inputs_embeds.shape
            flat = inputs_embeds.reshape(b * s, c)
            inputs_embeds = flat.at[idx].set(
                feats.astype(flat.dtype)).reshape(b, s, c)
        if pixel_values_videos is not None:
            video_grid_np = np.asarray(video_grid_thw)
            feats, video_deepstack = self.visual(
                jnp.asarray(pixel_values_videos), video_grid_np)
            video_mask = input_ids_np == cfg.video_token_id
            idx = jnp.asarray(
                np.argwhere(video_mask.reshape(-1)).reshape(-1))
            b, s, c = inputs_embeds.shape
            flat = inputs_embeds.reshape(b * s, c)
            inputs_embeds = flat.at[idx].set(
                feats.astype(flat.dtype)).reshape(b, s, c)

        visual_mask = None
        deepstack = None
        if image_mask is not None and video_mask is not None:
            visual_mask = image_mask | video_mask
            deepstack = []
            image_joint = image_mask[visual_mask]
            for imf, vif in zip(image_deepstack, video_deepstack):
                combined = jnp.zeros((int(visual_mask.sum()), imf.shape[-1]),
                                     imf.dtype)
                combined = combined.at[
                    jnp.asarray(np.argwhere(image_joint).reshape(-1))].set(
                        imf)
                combined = combined.at[
                    jnp.asarray(np.argwhere(~image_joint).reshape(-1))].set(
                        vif)
                deepstack.append(combined)
        elif image_mask is not None:
            visual_mask = image_mask
            deepstack = image_deepstack
        elif video_mask is not None:
            visual_mask = video_mask
            deepstack = video_deepstack

        position_ids = get_rope_index(
            input_ids_np,
            None if image_grid_thw is None else np.asarray(image_grid_thw),
            None if video_grid_thw is None else np.asarray(video_grid_thw),
            cfg.vision_spatial_merge_size, cfg.vision_start_token_id,
            cfg.image_token_id, cfg.video_token_id)
        cos, sin = mrope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta,
                                 cfg.mrope_section)

        mask_bias = None
        if attention_mask is not None:
            mask_np = np.asarray(attention_mask).astype(bool)
            if not mask_np.all():
                bias = np.where(mask_np[:, None, None, :], 0.0,
                                float(np.finfo(np.float32).min))
                mask_bias = jnp.asarray(bias, jnp.float32)

        out = self.language_model(inputs_embeds, jnp.asarray(cos),
                                  jnp.asarray(sin), mask_bias,
                                  output_hidden_states, visual_mask,
                                  deepstack)
        out.attention_mask = attention_mask
        return out


MINIMAX_H3_QWEN3_VL_PARAM_NAMES_MAPPING: dict[str, str] = {
    # strip the torch "model." prefix; drop the unused LM head
    r"^model\.(.*)$": r"\1",
    # the ViT patch embed is a kernel==stride conv == Linear over rows
    r"^(.*)\.patch_embed\.proj\.(weight|bias)$": r"\1.patch_embed_proj.\2",
    # torch Embedding weight -> our Embedding table
    r"^visual\.pos_embed\.weight$": r"visual.pos_embed.weight",
}


@dataclasses.dataclass
class MiniMaxH3Qwen3VLConfig(ModelConfig):
    arch_config: MiniMaxH3Qwen3VLArchConfig = dataclasses.field(
        default_factory=MiniMaxH3Qwen3VLArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(
            MINIMAX_H3_QWEN3_VL_PARAM_NAMES_MAPPING))


EntryClass = MiniMaxH3Qwen3VLConditioner
