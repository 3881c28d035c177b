"""Qwen2.5-VL (Reason1) multimodal text encoder.

Behavioral reference: /root/reference/fastvideo/models/encoders/
qwen2_5_vl_custom.py (:97-1100) + reason1.py: a windowed-attention vision
tower (14px patches, 2x2 spatial merger, full attention only at
``fullatt_block_indexes``) whose merged embeddings splice into the text
stream at image/video pad tokens; the Qwen2 decoder runs with sectioned
3-D mrope. Used by Cosmos 2.5 / Kandinsky 5 as the Reason1 conditioner
(all hidden states are returned for the full-concat postprocess).

TPU shape: window indices / cu_seqlens / rope tables are host-side numpy
(static per image grid); attention masking is a block-diagonal bias so
the whole tower jits with static shapes per grid.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.configs.models.base import ArchConfig, ModelConfig
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.models.encoders.t5 import BaseEncoderOutput

Array = jax.Array

NEG_INF = float(np.finfo(np.float32).min)

QWEN25_VL_PARAM_NAMES_MAPPING: dict[str, str] = {
    r"^model\.(.*)$": r"\1",
    r"^visual\.patch_embed\.proj\.(.*)$": r"visual.patch_embed.\1",
    r"^visual\.merger\.mlp\.0\.(.*)$": r"visual.merger.mlp_1.\1",
    r"^visual\.merger\.mlp\.2\.(.*)$": r"visual.merger.mlp_2.\1",
}


@dataclasses.dataclass
class Qwen25VLArchConfig(ArchConfig):
    """Qwen2.5-VL-7B defaults (reference reason1.py:69-78)."""

    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_hidden_layers: int = 28
    num_attention_heads: int = 28
    num_key_value_heads: int = 4
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    mrope_section: tuple[int, int, int] = (16, 24, 24)
    text_len: int = 512

    vision_start_token_id: int = 151652
    image_token_id: int = 151655
    video_token_id: int = 151656

    vision_depth: int = 32
    vision_hidden_size: int = 1280
    vision_intermediate_size: int = 3420
    vision_num_heads: int = 16
    vision_in_channels: int = 3
    vision_patch_size: int = 14
    vision_temporal_patch_size: int = 2
    vision_spatial_merge_size: int = 2
    vision_window_size: int = 112
    vision_out_hidden_size: int = 3584
    vision_fullatt_block_indexes: tuple[int, ...] = (7, 15, 23, 31)
    # video temporal-position scale (reference vision_config)
    vision_tokens_per_second: int = 2


@dataclasses.dataclass
class Qwen25VLConfig(ModelConfig):
    arch_config: Qwen25VLArchConfig = dataclasses.field(
        default_factory=Qwen25VLArchConfig)
    param_names_mapping: dict[str, str] = dataclasses.field(
        default_factory=lambda: dict(QWEN25_VL_PARAM_NAMES_MAPPING))


def get_rope_index_qwen25vl(
        input_ids: np.ndarray,
        image_grid_thw: np.ndarray | None,
        video_grid_thw: np.ndarray | None,
        spatial_merge_size: int, vision_start_token_id: int,
        image_token_id: int, video_token_id: int,
        tokens_per_second: int = 2,
        second_per_grid_ts: np.ndarray | None = None,
        attention_mask: np.ndarray | None = None) -> np.ndarray:
    """3D multimodal positions, Qwen2.5-VL semantics (reference
    qwen2_5_vl_custom.py:1585-1675). Host-side numpy.

    Unlike Qwen3-VL (one vision block per FRAME with t=1), a Qwen2.5-VL
    video is ONE vision block of t*h*w tokens whose temporal index is
    ``frame_idx * second_per_grid_t * tokens_per_second``. Positions are
    computed over attention-unmasked tokens only; masked slots get 1.
    """
    b, s = input_ids.shape
    if image_grid_thw is None and video_grid_thw is None:
        if attention_mask is not None:
            pos = np.cumsum(attention_mask, axis=-1) - 1
            pos[attention_mask == 0] = 1
            return np.broadcast_to(pos[None], (3, b, s)).copy()
        return np.broadcast_to(np.arange(s)[None, None], (3, b, s)).copy()
    position_ids = np.ones((3, b, s), np.int64)
    image_index = video_index = 0
    merge = spatial_merge_size
    for bi in range(b):
        sequence = input_ids[bi]
        keep = (np.ones(s, bool) if attention_mask is None
                else np.asarray(attention_mask[bi]) > 0)
        sequence = sequence[keep]
        tokens = sequence.tolist()
        starts = np.argwhere(sequence == vision_start_token_id).reshape(-1)
        vision_tokens = (sequence[starts + 1] if len(starts)
                         else np.array([]))
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
                spg = 0.0
                image_index += 1
                remaining_images -= 1
                end = image_end
            else:
                f, h, w = (int(v) for v in video_grid_thw[video_index])
                spg = (float(second_per_grid_ts[video_index])
                       if second_per_grid_ts is not None else 1.0)
                video_index += 1
                remaining_videos -= 1
                end = video_end
            gf, gh, gw = f, h // merge, w // merge
            text_length = end - start
            offset = int(pieces[-1].max()) + 1 if pieces else 0
            pieces.append(
                np.broadcast_to(np.arange(text_length)[None],
                                (3, text_length)) + offset)
            temporal = np.repeat(
                (np.arange(gf) * spg * tokens_per_second).astype(np.int64),
                gh * gw)
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
        position_ids[:, bi, keep] = np.concatenate(pieces, axis=1)
    return position_ids


def _rotate_half(x: Array) -> Array:
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-b, a], axis=-1)


def sectioned_mrope_cos_sin(position_ids: np.ndarray, head_dim: int,
                            theta: float,
                            section: tuple[int, int, int]
                            ) -> tuple[np.ndarray, np.ndarray]:
    """Qwen2.5-VL sectioned mrope (reference
    apply_multimodal_rotary_pos_emb:598-640): the duplicated-half channel
    dim splits into t/h/w sections twice over."""
    inv_freq = 1.0 / theta ** (np.arange(0, head_dim, 2, np.float64) /
                               head_dim)
    freqs = position_ids[:, :, :, None].astype(np.float64) * inv_freq
    emb = np.concatenate([freqs, freqs], axis=-1)  # [3, B, S, head_dim]
    cos3, sin3 = np.cos(emb), np.sin(emb)
    sections = list(section) * 2
    bounds = np.cumsum([0] + sections)
    cos = np.empty(cos3.shape[1:], np.float32)
    sin = np.empty(sin3.shape[1:], np.float32)
    for i in range(len(sections)):
        lo, hi = bounds[i], bounds[i + 1]
        cos[..., lo:hi] = cos3[i % 3, ..., lo:hi]
        sin[..., lo:hi] = sin3[i % 3, ..., lo:hi]
    return cos, sin


# -- vision tower ----------------------------------------------------------


def vision_rot_pos_emb(grid_thw: np.ndarray, head_dim: int,
                       spatial_merge_size: int) -> np.ndarray:
    """Per-token (h, w) rotary freqs [S, head_dim // 2]
    (reference rot_pos_emb:364-391)."""
    pos_ids = []
    m = spatial_merge_size
    for t, h, w in grid_thw:
        t, h, w = int(t), int(h), int(w)
        hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
        hpos = hpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3)
        wpos = np.broadcast_to(np.arange(w)[None], (h, w))
        wpos = wpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3)
        ids = np.stack([hpos.reshape(-1), wpos.reshape(-1)], axis=-1)
        pos_ids.append(np.tile(ids, (t, 1)))
    pos_ids = np.concatenate(pos_ids, axis=0)
    dim = head_dim // 2
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim, 2, np.float64) / dim))
    freqs = pos_ids[..., None].astype(np.float64) * inv_freq  # [S, 2, d/4]
    return freqs.reshape(pos_ids.shape[0], -1).astype(np.float32)


def vision_window_index(grid_thw: np.ndarray, window_size: int,
                        spatial_merge_size: int,
                        patch_size: int) -> tuple[np.ndarray, np.ndarray]:
    """(window permutation over merge units, cu_seqlens per window)
    (reference get_window_index:392-431)."""
    out_index = []
    cu = [0]
    base = 0
    vit_win = window_size // spatial_merge_size // patch_size
    unit = spatial_merge_size * spatial_merge_size
    for t, h, w in grid_thw:
        t, lh, lw = int(t), int(h) // spatial_merge_size, \
            int(w) // spatial_merge_size
        index = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h = (-lh) % vit_win
        pad_w = (-lw) % vit_win
        nh, nw = (lh + pad_h) // vit_win, (lw + pad_w) // vit_win
        padded = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
        padded[:, :lh, :lw] = index
        padded = padded.reshape(t, nh, vit_win, nw, vit_win)
        padded = padded.transpose(0, 1, 3, 2, 4).reshape(
            t, nh * nw, vit_win, vit_win)
        seqlens = (padded != -100).sum(axis=(2, 3)).reshape(-1)
        flat = padded.reshape(-1)
        out_index.append(flat[flat != -100] + base)
        cu.extend((np.cumsum(seqlens) * unit + cu[-1]).tolist())
        base += t * lh * lw
    cu = np.asarray(cu, np.int64)
    keep = np.concatenate([[True], np.diff(cu) != 0])
    return np.concatenate(out_index), cu[keep]


def _cu_seqlens_bias(cu: np.ndarray, seq_len: int) -> np.ndarray:
    """Block-diagonal additive mask from cumulative sequence lengths."""
    seg = np.zeros((seq_len,), np.int64)
    seg[cu[1:-1]] = 1
    seg = np.cumsum(seg)
    ok = seg[:, None] == seg[None, :]
    return np.where(ok, 0.0, NEG_INF).astype(np.float32)


class Q25VisionAttention(nnx.Module):
    """(reference Qwen2_5_VLVisionSdpaAttention:263-320)."""

    def __init__(self, cfg: Qwen25VLArchConfig, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.num_heads = cfg.vision_num_heads
        self.head_dim = cfg.vision_hidden_size // cfg.vision_num_heads
        self.qkv = Linear(cfg.vision_hidden_size,
                          cfg.vision_hidden_size * 3, **kw)
        self.proj = Linear(cfg.vision_hidden_size, cfg.vision_hidden_size,
                           **kw)

    def __call__(self, x: Array, bias: Array, cos: Array,
                 sin: Array) -> Array:
        s = x.shape[0]
        qkv = self.qkv(x).reshape(s, 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]

        def rope(t):
            tf = t.astype(jnp.float32)
            return (tf * cos[:, None] +
                    _rotate_half(tf) * sin[:, None]).astype(t.dtype)

        q, k = rope(q), rope(k)
        out = jax.nn.dot_product_attention(
            q[None], k[None], v[None], bias=bias[None, None])
        return self.proj(out[0].reshape(s, -1))


class Q25VisionBlock(nnx.Module):
    def __init__(self, cfg: Qwen25VLArchConfig, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm1 = Q25RMSNorm(cfg.vision_hidden_size, **kw)
        self.norm2 = Q25RMSNorm(cfg.vision_hidden_size, **kw)
        self.attn = Q25VisionAttention(cfg, **kw)
        self.mlp = Q25MLP(cfg.vision_hidden_size,
                          cfg.vision_intermediate_size, bias=True, **kw)

    def __call__(self, x, bias, cos, sin):
        x = x + self.attn(self.norm1(x), bias, cos, sin)
        return x + self.mlp(self.norm2(x))


class Q25RMSNorm(nnx.Module):
    def __init__(self, dim: int, eps: float = 1e-6, *, param_dtype,
                 rngs: nnx.Rngs):
        del rngs
        self.weight = nnx.Param(jnp.ones((dim,), param_dtype))
        self.eps = eps

    def __call__(self, x: Array) -> Array:
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + self.eps)
        return (self.weight.value.astype(jnp.float32) * xf).astype(x.dtype)


class Q25MLP(nnx.Module):
    """gate/up/down SiLU MLP (reference Qwen2_5_VLMLP / Qwen2MLP)."""

    def __init__(self, hidden: int, intermediate: int, bias: bool = False,
                 *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.gate_proj = Linear(hidden, intermediate, bias, **kw)
        self.up_proj = Linear(hidden, intermediate, bias, **kw)
        self.down_proj = Linear(intermediate, hidden, bias, **kw)

    def __call__(self, x: Array) -> Array:
        return self.down_proj(jax.nn.silu(self.gate_proj(x)) *
                              self.up_proj(x))


class Q25PatchMerger(nnx.Module):
    """(reference Qwen2_5_VLPatchMerger:185-203)."""

    def __init__(self, cfg: Qwen25VLArchConfig, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        hidden = cfg.vision_hidden_size * cfg.vision_spatial_merge_size**2
        self.ln_q = Q25RMSNorm(cfg.vision_hidden_size, **kw)
        self.mlp_1 = Linear(hidden, hidden, **kw)
        self.mlp_2 = Linear(hidden, cfg.vision_out_hidden_size, **kw)

    def __call__(self, x: Array) -> Array:
        h = self.ln_q(x).reshape(-1, self.mlp_1.kernel.value.shape[0])
        return self.mlp_2(jax.nn.gelu(self.mlp_1(h)))


class Qwen25VisionTransformer(nnx.Module):
    """(reference :322-494)."""

    def __init__(self, cfg: Qwen25VLArchConfig, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.cfg = cfg
        in_feats = (cfg.vision_in_channels * cfg.vision_temporal_patch_size *
                    cfg.vision_patch_size**2)
        # conv3d with kernel == stride == patch: a Linear over the folded
        # patch features (the loader reshapes the conv weight)
        self.patch_embed = Linear(in_feats, cfg.vision_hidden_size,
                                  bias=False, **kw)
        self.blocks = nnx.List([
            Q25VisionBlock(cfg, **kw) for _ in range(cfg.vision_depth)
        ])
        self.merger = Q25PatchMerger(cfg, **kw)

    def __call__(self, pixels: Array,
                 grid_thw: np.ndarray) -> Array:
        """pixels [S, C*tp*ps*ps] flattened patches; returns merged
        embeddings [S / merge_unit, out_hidden]."""
        cfg = self.cfg
        head_dim = cfg.vision_hidden_size // cfg.vision_num_heads
        x = self.patch_embed(pixels)
        seq_len = x.shape[0]
        unit = cfg.vision_spatial_merge_size**2

        freqs = vision_rot_pos_emb(grid_thw, head_dim,
                                   cfg.vision_spatial_merge_size)
        win_index, cu_window = vision_window_index(
            grid_thw, cfg.vision_window_size, cfg.vision_spatial_merge_size,
            cfg.vision_patch_size)
        # reorder merge units into window-major order
        x = x.reshape(seq_len // unit, unit, -1)[jnp.asarray(win_index)]
        x = x.reshape(seq_len, -1)
        freqs = freqs.reshape(seq_len // unit, unit,
                              -1)[win_index].reshape(seq_len, -1)
        emb = np.concatenate([freqs, freqs], axis=-1)
        cos = jnp.asarray(np.cos(emb), jnp.float32)
        sin = jnp.asarray(np.sin(emb), jnp.float32)

        cu_full = np.concatenate(
            [[0], np.cumsum((grid_thw[:, 1] * grid_thw[:, 2]).repeat(
                grid_thw[:, 0]))]).astype(np.int64)
        bias_full = jnp.asarray(_cu_seqlens_bias(cu_full, seq_len))
        bias_win = jnp.asarray(_cu_seqlens_bias(cu_window, seq_len))

        full_set = set(int(i) for i in cfg.vision_fullatt_block_indexes)
        for i, blk in enumerate(self.blocks):
            x = blk(x, bias_full if i in full_set else bias_win, cos, sin)
        x = self.merger(x)
        reverse = np.argsort(win_index)
        return x[jnp.asarray(reverse)]


# -- text decoder ----------------------------------------------------------


class Q25TextAttention(nnx.Module):
    """GQA with biased qkv, sectioned mrope (reference :651-760)."""

    def __init__(self, cfg: Qwen25VLArchConfig, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.n = cfg.num_attention_heads
        self.n_kv = cfg.num_key_value_heads
        self.d = cfg.head_dim
        h = cfg.hidden_size
        self.q_proj = Linear(h, self.n * self.d, True, **kw)
        self.k_proj = Linear(h, self.n_kv * self.d, True, **kw)
        self.v_proj = Linear(h, self.n_kv * self.d, True, **kw)
        self.o_proj = Linear(self.n * self.d, h, False, **kw)

    def __call__(self, x: Array, cos: Array, sin: Array,
                 bias: Array) -> Array:
        b, s, _ = x.shape
        q = self.q_proj(x).reshape(b, s, self.n, self.d)
        k = self.k_proj(x).reshape(b, s, self.n_kv, self.d)
        v = self.v_proj(x).reshape(b, s, self.n_kv, self.d)

        def rope(t):
            tf = t.astype(jnp.float32)
            return (tf * cos[:, :, None] +
                    _rotate_half(tf) * sin[:, :, None]).astype(t.dtype)

        q, k = rope(q), rope(k)
        rep = self.n // self.n_kv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        out = jax.nn.dot_product_attention(q, k, v, bias=bias)
        return self.o_proj(out.reshape(b, s, -1))


class Q25TextLayer(nnx.Module):
    def __init__(self, cfg: Qwen25VLArchConfig, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.input_layernorm = Q25RMSNorm(cfg.hidden_size,
                                          cfg.rms_norm_eps, **kw)
        self.post_attention_layernorm = Q25RMSNorm(cfg.hidden_size,
                                                   cfg.rms_norm_eps, **kw)
        self.self_attn = Q25TextAttention(cfg, **kw)
        self.mlp = Q25MLP(cfg.hidden_size, cfg.intermediate_size, False,
                          **kw)

    def __call__(self, x, cos, sin, bias):
        x = x + self.self_attn(self.input_layernorm(x), cos, sin, bias)
        return x + self.mlp(self.post_attention_layernorm(x))


class Qwen25VLForConditionalGeneration(nnx.Module):
    """Vision tower + Qwen2 decoder with image-token splice + sectioned
    mrope (reference Qwen2_5_VLForConditionalGenerationSimple).

    Returns BaseEncoderOutput with ``hidden_states`` = (embed, every
    layer, final norm) for the Reason1 full-concat postprocess.
    """

    def __init__(self, config: Qwen25VLArchConfig, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        from fastvideo_tpu.layers.embeddings import Embedding

        self.visual = Qwen25VisionTransformer(config, **kw)
        self.embed_tokens = Embedding(config.vocab_size,
                                      config.hidden_size, **kw)
        self.layers = nnx.List([
            Q25TextLayer(config, **kw)
            for _ in range(config.num_hidden_layers)
        ])
        self.norm = Q25RMSNorm(config.hidden_size, config.rms_norm_eps,
                               **kw)

    def __call__(self, input_ids: Array,
                 attention_mask: Array | None = None,
                 pixel_values: Array | None = None,
                 image_grid_thw: np.ndarray | None = None,
                 video_grid_thw: np.ndarray | None = None,
                 output_hidden_states: bool = True,
                 **kwargs) -> BaseEncoderOutput:
        cfg = self.config
        ids_np = np.asarray(input_ids)
        x = self.embed_tokens(input_ids)
        if pixel_values is not None and (image_grid_thw is not None
                                         or video_grid_thw is not None):
            grids = [g for g in (image_grid_thw, video_grid_thw)
                     if g is not None]
            grid = np.concatenate(grids, axis=0)
            vis = self.visual(pixel_values.astype(x.dtype), grid)
            # vis rows are ordered [all image grids, then all video
            # grids] — splice each token type from its own span (a
            # combined scatter routes image embeds to video tokens
            # whenever a video precedes an image in the prompt; the
            # reference splices by token id)
            merge2 = cfg.vision_spatial_merge_size ** 2
            n_img = (0 if image_grid_thw is None
                     else int(np.prod(image_grid_thw, axis=1).sum()) //
                     merge2)
            for token_id, lo, hi in (
                    (cfg.image_token_id, 0, n_img),
                    (cfg.video_token_id, n_img, vis.shape[0])):
                if hi <= lo:
                    continue
                span = vis[lo:hi]
                is_tok = ids_np == token_id
                order = np.cumsum(is_tok.reshape(-1)) - 1
                gathered = span[jnp.asarray(
                    np.clip(order, 0, span.shape[0] - 1))]
                gathered = gathered.reshape(*ids_np.shape, -1)
                x = jnp.where(jnp.asarray(is_tok)[..., None], gathered, x)

        position_ids = get_rope_index_qwen25vl(
            ids_np, image_grid_thw, video_grid_thw,
            cfg.vision_spatial_merge_size, cfg.vision_start_token_id,
            cfg.image_token_id, cfg.video_token_id,
            tokens_per_second=cfg.vision_tokens_per_second,
            second_per_grid_ts=kwargs.get("second_per_grid_ts"),
            attention_mask=(None if attention_mask is None
                            else np.asarray(attention_mask)))
        cos_np, sin_np = sectioned_mrope_cos_sin(
            position_ids, cfg.head_dim, cfg.rope_theta, cfg.mrope_section)
        cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

        s = x.shape[1]
        ok = np.tril(np.ones((s, s), bool))[None, None]
        if attention_mask is not None:
            ok = ok & (np.asarray(attention_mask)[:, None, None, :] > 0)
        bias = jnp.asarray(np.where(ok, 0.0, NEG_INF).astype(np.float32))

        hidden_states = [x]
        for layer in self.layers:
            x = layer(x, cos, sin, bias)
            hidden_states.append(x)
        final = self.norm(x)
        hidden_states.append(final)
        return BaseEncoderOutput(
            last_hidden_state=final, attention_mask=attention_mask,
            hidden_states=tuple(hidden_states)
            if output_hidden_states else None)


EntryClass = Qwen25VLForConditionalGeneration
