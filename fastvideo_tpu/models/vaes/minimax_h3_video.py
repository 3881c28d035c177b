"""MiniMax-H3 video VAE, TPU-native (channels-last).

Behavioral reference: /root/reference/fastvideo/models/vaes/minimax_h3_video.py
(:60-845): a causal 3D-CNN encoder (reflect spatial padding, constant causal
temporal padding, per-frame GroupNorm) paired with a full-attention ViT
decoder (register + cls tokens, 3-axis rotary embeddings over normalized
[-1,1) grid coordinates, zero-init residual scales, SwiGLU FF). Video is
processed in fixed ``clip_length``-frame chunks whose trailing ``token_drop``
latent tokens are dropped at encode and re-synthesized at decode from the
next chunk's overlap, with linear cross-fade blending on the overlapping
frames (reference ``_decode``, :753-793).

TPU shape: tensors are [B, T, H, W, C] internally (NCDHW at the API
boundary); convs ride the shared :class:`CausalConv3d` temporal-tap
decomposition, attention rides the Pallas flash kernel. Chunk iteration is a
host-side loop over static shapes, so each distinct clip count compiles
once.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.configs.models.base import ModelConfig, VAEArchConfig
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.norm import FP32LayerNorm, RMSNorm
from fastvideo_tpu.models.dits.minimax_h3 import _apply_partial_rope
from fastvideo_tpu.models.vaes.wan import (CausalConv3d,
                                           DiagonalGaussianDistribution)

Array = jax.Array

MINIMAX_H3_VIDEO_VAE_PARAM_NAMES_MAPPING: dict[str, str] = {
    # reference FeedForward.net = [SwiGLU, Dropout, Linear]; ours drops the
    # paramless Dropout slot
    r"^(.*)\.ff\.net\.2\.(weight|bias)$": r"\1.ff.net.1.\2",
}


@dataclasses.dataclass
class MiniMaxH3VideoVAEArchConfig(VAEArchConfig):
    """Reference: configs/models/vaes/minimax_h3_video.py."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 24
    block_out_channels: tuple[int, ...] = (128, 256, 256, 512, 512, 1024)
    layers_per_block: int = 2
    spatial_downsample_factors: tuple[int, ...] = (2, 2, 2, 2, 1, 1)
    temporal_downsample_factors: tuple[int, ...] = (1, 2, 2, 1, 1, 1)
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    spatial_padding_mode: str = "reflect"

    decoder_num_layers: int = 36
    decoder_num_attention_heads: int = 32
    decoder_attention_head_dim: int = 64
    decoder_num_register_tokens: int = 4
    decoder_ffn_mult: int = 4
    decoder_rope_theta: float = 100.0
    decoder_rope_dim_ratio: float = 0.75
    decoder_norm_eps: float = 1e-5

    clip_length: int = 17
    token_drop: int = 3
    latents_mean: tuple[float, ...] = (0.0,) * 24
    latents_std: tuple[float, ...] = (1.0,) * 24
    scaling_factor: float = 1.0

    @property
    def spatial_compression_ratio(self) -> int:
        return math.prod(self.spatial_downsample_factors)

    @property
    def temporal_compression_ratio(self) -> int:
        return math.prod(self.temporal_downsample_factors)

    @property
    def z_dim(self) -> int:
        return self.latent_channels


class MMVideoCausalConv3d(CausalConv3d):
    """Reflect spatial pad + constant causal temporal pad
    (reference MiniMaxH3VideoCausalConv3d, :60-88)."""

    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: int | tuple[int, int, int],
                 stride: int | tuple[int, int, int] = 1,
                 spatial_padding: int = 0, temporal_padding: int = 0,
                 spatial_padding_mode: str = "reflect", *,
                 param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        super().__init__(in_channels, out_channels, kernel_size,
                         stride=stride, padding=0, param_dtype=param_dtype,
                         rngs=rngs)
        self.spatial_pad = spatial_padding
        self.temporal_pad = temporal_padding
        self.spatial_padding_mode = spatial_padding_mode

    def __call__(self, x: Array, **kwargs) -> Array:  # [B,T,H,W,C]
        p = self.spatial_pad
        if p > 0:
            x = jnp.pad(x, ((0, 0), (0, 0), (p, p), (p, p), (0, 0)),
                        mode=self.spatial_padding_mode)
        if self.temporal_pad > 0:
            x = jnp.pad(x, ((0, 0), (self.temporal_pad, 0), (0, 0), (0, 0),
                            (0, 0)))
        return super().__call__(x, time_pad=0)


class MMVideoGroupNorm(nnx.Module):
    """GroupNorm with each temporal frame normalized independently
    (reference :91-100): stats over (H, W, C//G) per (batch, frame,
    group)."""

    def __init__(self, num_groups: int, num_channels: int,
                 eps: float = 1e-6, *,
                 param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        del rngs
        self.num_groups = num_groups
        self.eps = eps
        self.weight = nnx.Param(jnp.ones((num_channels,), param_dtype))
        self.bias = nnx.Param(jnp.zeros((num_channels,), param_dtype))

    def __call__(self, x: Array) -> Array:  # [B,T,H,W,C]
        b, t, h, w, c = x.shape
        g = self.num_groups
        xf = x.astype(jnp.float32).reshape(b, t, h, w, g, c // g)
        mean = xf.mean(axis=(2, 3, 5), keepdims=True)
        var = xf.var(axis=(2, 3, 5), keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        xf = xf.reshape(b, t, h, w, c)
        out = xf * self.weight.value.astype(jnp.float32)
        out = out + self.bias.value.astype(jnp.float32)
        return out.astype(x.dtype)


class MMVideoResnetBlock3d(nnx.Module):
    """Reference :103-143."""

    def __init__(self, in_channels: int, out_channels: int,
                 norm_num_groups: int, norm_eps: float,
                 spatial_padding_mode: str, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm1 = MMVideoGroupNorm(norm_num_groups, in_channels,
                                      eps=norm_eps, **kw)
        self.conv1 = MMVideoCausalConv3d(
            in_channels, out_channels, 3, spatial_padding=1,
            temporal_padding=2, spatial_padding_mode=spatial_padding_mode,
            **kw)
        self.norm2 = MMVideoGroupNorm(norm_num_groups, out_channels,
                                      eps=norm_eps, **kw)
        self.conv2 = MMVideoCausalConv3d(
            out_channels, out_channels, 3, spatial_padding=1,
            temporal_padding=2, spatial_padding_mode=spatial_padding_mode,
            **kw)
        if in_channels != out_channels:
            self.conv_shortcut = MMVideoCausalConv3d(in_channels,
                                                     out_channels, 1, **kw)
        else:
            self.conv_shortcut = None

    def __call__(self, x: Array) -> Array:
        residual = x
        x = self.conv1(jax.nn.silu(self.norm1(x)))
        x = self.conv2(jax.nn.silu(self.norm2(x)))
        if self.conv_shortcut is not None:
            residual = self.conv_shortcut(residual)
        return residual + x


class MMVideoDownsample3d(nnx.Module):
    """Strided causal conv; +1 trailing reflect pad on H/W when the spatial
    stride is 2 (reference :146-170)."""

    def __init__(self, in_channels: int, out_channels: int,
                 temporal_stride: int, spatial_stride: int,
                 spatial_padding_mode: str, *, param_dtype, rngs: nnx.Rngs):
        self.spatial_stride = spatial_stride
        self.spatial_padding_mode = spatial_padding_mode
        self.conv = MMVideoCausalConv3d(
            in_channels, out_channels, 3,
            stride=(temporal_stride, spatial_stride, spatial_stride),
            temporal_padding=2, spatial_padding_mode=spatial_padding_mode,
            param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        if self.spatial_stride == 2:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)),
                        mode=self.spatial_padding_mode)
        return self.conv(x)


class MMVideoDownBlock3d(nnx.Module):
    def __init__(self, in_channels: int, out_channels: int, num_layers: int,
                 temporal_downsample_factor: int,
                 spatial_downsample_factor: int, norm_num_groups: int,
                 norm_eps: float, spatial_padding_mode: str, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.resnets = nnx.List([
            MMVideoResnetBlock3d(in_channels if i == 0 else out_channels,
                                 out_channels, norm_num_groups, norm_eps,
                                 spatial_padding_mode, **kw)
            for i in range(num_layers)
        ])
        if temporal_downsample_factor * spatial_downsample_factor > 1:
            self.downsamplers = nnx.List([
                MMVideoDownsample3d(out_channels, out_channels,
                                    temporal_downsample_factor,
                                    spatial_downsample_factor,
                                    spatial_padding_mode, **kw)
            ])
        else:
            self.downsamplers = None

    def __call__(self, x: Array) -> Array:
        for resnet in self.resnets:
            x = resnet(x)
        if self.downsamplers is not None:
            for down in self.downsamplers:
                x = down(x)
        return x


class MMVideoEncoder3d(nnx.Module):
    """Reference :225-277."""

    def __init__(self, arch: MiniMaxH3VideoVAEArchConfig, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        ch = tuple(arch.block_out_channels)
        self.conv_in = MMVideoCausalConv3d(
            arch.in_channels, ch[0], 3, spatial_padding=1,
            temporal_padding=2,
            spatial_padding_mode=arch.spatial_padding_mode, **kw)
        block_in = (ch[0],) + ch[:-1]
        self.down_blocks = nnx.List([
            MMVideoDownBlock3d(block_in[i], ch[i], arch.layers_per_block,
                               arch.temporal_downsample_factors[i],
                               arch.spatial_downsample_factors[i],
                               arch.norm_num_groups, arch.norm_eps,
                               arch.spatial_padding_mode, **kw)
            for i in range(len(ch))
        ])
        self.norm_out = MMVideoGroupNorm(arch.norm_num_groups, ch[-1],
                                         eps=arch.norm_eps, **kw)
        self.conv_out = MMVideoCausalConv3d(
            ch[-1], 2 * arch.latent_channels, 3, spatial_padding=1,
            temporal_padding=2,
            spatial_padding_mode=arch.spatial_padding_mode, **kw)

    def __call__(self, x: Array) -> Array:
        x = self.conv_in(x)
        for block in self.down_blocks:
            x = block(x)
        return self.conv_out(jax.nn.silu(self.norm_out(x)))


def mm_video_rope(num_frames: int, height: int, width: int,
                  rotary_dim: int, theta: float,
                  num_suffix: int) -> tuple[np.ndarray, np.ndarray]:
    """3-axis rope over normalized [-1, 1) grid coords
    (reference :280-291, :451-458). Returns (cos, sin) [L+suffix,
    rotary_dim]."""
    inv_freq = 1.0 / theta ** np.arange(0, 1, 6 / rotary_dim,
                                        dtype=np.float32)
    grids = [2.0 * (np.arange(0.5, size, dtype=np.float32) / size) - 1.0
             for size in (num_frames, height, width)]
    pos = np.stack(np.meshgrid(*grids, indexing="ij"),
                   axis=-1).reshape(-1, 3)
    pos = np.concatenate(
        [pos, np.zeros((num_suffix, 3), np.float32)], axis=0)
    angles = 2.0 * np.pi * pos[:, :, None] * inv_freq[None, None, :]
    angles = angles.reshape(pos.shape[0], -1)
    angles = np.tile(angles, 2)
    return np.cos(angles), np.sin(angles)


class MMVideoAttention(nnx.Module):
    """Full attention w/ per-head-dim no-affine q/k RMSNorm
    (reference :294-336)."""

    def __init__(self, dim: int, heads: int, dim_head: int,
                 eps: float = 1e-5, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.heads = heads
        self.dim_head = dim_head
        inner = heads * dim_head
        self.norm_q = RMSNorm(dim_head, eps, has_weight=False, **kw)
        self.norm_k = RMSNorm(dim_head, eps, has_weight=False, **kw)
        self.to_q = Linear(dim, inner, **kw)
        self.to_k = Linear(dim, inner, **kw)
        self.to_v = Linear(dim, inner, **kw)
        self.to_out = nnx.List([Linear(inner, dim, **kw)])

    def __call__(self, x: Array, rope) -> Array:  # x [B,S,D]
        b, s, _ = x.shape
        q = self.to_q(x).reshape(b, s, self.heads, self.dim_head)
        k = self.to_k(x).reshape(b, s, self.heads, self.dim_head)
        v = self.to_v(x).reshape(b, s, self.heads, self.dim_head)
        q = self.norm_q(q)
        k = self.norm_k(k)
        if rope is not None:
            cos, sin = rope
            q = _apply_partial_rope(q, cos, sin)
            k = _apply_partial_rope(k, cos, sin)
        from fastvideo_tpu.ops.flash_attention import flash_attention
        out = flash_attention(q, k, v)
        return self.to_out[0](out.reshape(b, s, -1))


class MMVideoSwiGLU(nnx.Module):
    def __init__(self, dim_in: int, dim_out: int, *, param_dtype,
                 rngs: nnx.Rngs):
        self.proj = Linear(dim_in, dim_out * 2, param_dtype=param_dtype,
                           rngs=rngs)

    def __call__(self, x: Array) -> Array:
        x, gate = jnp.split(self.proj(x), 2, axis=-1)
        return x * jax.nn.silu(gate)


class MMVideoFeedForward(nnx.Module):
    def __init__(self, dim: int, mult: int, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.net = nnx.List([
            MMVideoSwiGLU(dim, int(dim * mult), **kw),
            Linear(int(dim * mult), dim, **kw),
        ])

    def __call__(self, x: Array) -> Array:
        return self.net[1](self.net[0](x))


class MMVideoTransformerBlock(nnx.Module):
    """Pre-RMSNorm block with zero-init residual scales
    (reference :368-394)."""

    def __init__(self, dim: int, heads: int, dim_head: int, ffn_mult: int,
                 eps: float, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm1 = RMSNorm(dim, eps, **kw)
        self.attn = MMVideoAttention(dim, heads, dim_head, eps=eps, **kw)
        self.scale1 = nnx.Param(jnp.zeros((dim,), param_dtype))
        self.norm2 = RMSNorm(dim, eps, **kw)
        self.ff = MMVideoFeedForward(dim, ffn_mult, **kw)
        self.scale2 = nnx.Param(jnp.zeros((dim,), param_dtype))

    def __call__(self, x: Array, rope) -> Array:
        h = self.norm1(x)
        x = x + self.attn(h, rope) * self.scale1.value.astype(x.dtype)
        h = self.norm2(x)
        return x + self.ff(h) * self.scale2.value.astype(x.dtype)


class MMVideoViTDecoder3d(nnx.Module):
    """Full-attention ViT decoder (reference :397-485)."""

    def __init__(self, arch: MiniMaxH3VideoVAEArchConfig, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        dim = arch.decoder_num_attention_heads * arch.decoder_attention_head_dim
        self.arch = arch
        self.patch_size = arch.spatial_compression_ratio
        self.patch_size_t = arch.temporal_compression_ratio
        self.rotary_dim = int(arch.decoder_attention_head_dim *
                              arch.decoder_rope_dim_ratio)
        self.proj_in = Linear(arch.latent_channels, dim, **kw)
        self.register_tokens = nnx.Param(
            jnp.zeros((1, arch.decoder_num_register_tokens, dim),
                      param_dtype))
        self.transformer_blocks = nnx.List([
            MMVideoTransformerBlock(dim, arch.decoder_num_attention_heads,
                                    arch.decoder_attention_head_dim,
                                    arch.decoder_ffn_mult,
                                    arch.decoder_norm_eps, **kw)
            for _ in range(arch.decoder_num_layers)
        ])
        self.norm_out = FP32LayerNorm(dim, eps=arch.decoder_norm_eps, **kw)
        self.proj_out = Linear(
            dim, arch.out_channels * self.patch_size_t *
            self.patch_size ** 2, **kw)
        self._rope_cache: dict[tuple[int, int, int],
                               tuple[np.ndarray, np.ndarray]] = {}

    def __call__(self, z: Array) -> Array:
        """z [B, T, H, W, C] latent -> pixels [B, out, T*pt, H*p, W*p]
        (NCDHW, matching the reference decoder output layout)."""
        b, t, h, w, c = z.shape
        x = self.proj_in(z.reshape(b, t * h * w, c))
        n_reg = self.register_tokens.value.shape[1]
        reg = jnp.broadcast_to(self.register_tokens.value.astype(x.dtype),
                               (b, n_reg, x.shape[-1]))
        cls = jnp.zeros_like(x[:, :1])
        x = jnp.concatenate([x, reg, cls], axis=1)

        key = (t, h, w)
        if key not in self._rope_cache:
            self._rope_cache[key] = mm_video_rope(
                t, h, w, self.rotary_dim, self.arch.decoder_rope_theta,
                n_reg + 1)
        cos, sin = self._rope_cache[key]
        rope = (jnp.asarray(cos), jnp.asarray(sin))

        for block in self.transformer_blocks:
            x = block(x, rope)
        x = self.proj_out(self.norm_out(x))[:, :t * h * w]

        p, pt = self.patch_size, self.patch_size_t
        out_ch = self.arch.out_channels
        x = x.reshape(b, t, h, w, out_ch, pt, p, p)
        x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7)
        return x.reshape(b, out_ch, t * pt, h * p, w * p)


def _blend(a: Array, b: Array, blend_extent: int, axis: int) -> Array:
    """Linear cross-fade on the seam (reference :641-658)."""
    blend_extent = min(a.shape[axis], b.shape[axis], blend_extent)
    pos = jnp.arange(blend_extent, dtype=b.dtype)
    shape = [1] * a.ndim
    shape[axis] = blend_extent
    w_a = (1 - pos / blend_extent).reshape(shape)
    w_b = (pos / blend_extent).reshape(shape)
    sl_a = [slice(None)] * a.ndim
    sl_a[axis] = slice(a.shape[axis] - blend_extent, None)
    sl_b = [slice(None)] * b.ndim
    sl_b[axis] = slice(0, blend_extent)
    blended = a[tuple(sl_a)] * w_a + b[tuple(sl_b)] * w_b
    if blend_extent == b.shape[axis]:
        return blended
    sl_rest = [slice(None)] * b.ndim
    sl_rest[axis] = slice(blend_extent, None)
    return jnp.concatenate([blended, b[tuple(sl_rest)]], axis=axis)


class AutoencoderKLMiniMaxH3(nnx.Module):
    """Reference :488-845. API boundary is NCDHW, fp32 weights and compute
    (the release pins the VAE to fp32; reference :567-590)."""

    def __init__(self, config: MiniMaxH3VideoVAEArchConfig,
                 load_encoder: bool = True, load_decoder: bool = True, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        # released encoder/decoder stay fp32 (reference :567-568)
        param_dtype = jnp.float32
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.config = config
        arch = config
        self.latent_channels = arch.latent_channels
        self.spatial_compression_ratio = arch.spatial_compression_ratio
        self.temporal_compression_ratio = arch.temporal_compression_ratio

        self.encoder = (MMVideoEncoder3d(arch, **kw)
                        if load_encoder else None)
        self.quant_conv = (MMVideoCausalConv3d(2 * arch.latent_channels,
                                               2 * arch.latent_channels, 1,
                                               **kw)
                           if load_encoder else None)
        self.post_quant_conv = (MMVideoCausalConv3d(arch.latent_channels,
                                                    arch.latent_channels, 1,
                                                    **kw)
                                if load_decoder else None)
        self.decoder = (MMVideoViTDecoder3d(arch, **kw)
                        if load_decoder else None)

        tcr = self.temporal_compression_ratio
        self.frame_pre_padding = (-arch.clip_length) % tcr
        self.tokens_chunk_size = math.ceil(arch.clip_length / tcr)
        self.token_overlap = (-arch.token_drop) % self.tokens_chunk_size
        self.frame_overlap = max(
            self.token_overlap * tcr - self.frame_pre_padding, 0)
        self.use_tiling = False
        self.tile_sample_min_height = 256
        self.tile_sample_min_width = 256
        self.tile_sample_min_overlap_height = 64
        self.tile_sample_min_overlap_width = 64

        self._latents_mean = np.asarray(arch.latents_mean, np.float32)
        self._latents_std = np.asarray(arch.latents_std, np.float32)
        self._pixel_mean = np.asarray((0.485, 0.456, 0.406), np.float32)
        self._pixel_std = np.asarray((0.229, 0.224, 0.225), np.float32)

    # -- normalization (reference :592-602) -------------------------------

    def normalize_latents(self, latents: Array) -> Array:
        shape = (1, -1, 1, 1, 1)
        return ((latents - self._latents_mean.reshape(shape)) /
                self._latents_std.reshape(shape))

    def denormalize_latents(self, latents: Array) -> Array:
        shape = (1, -1, 1, 1, 1)
        return (latents.astype(jnp.float32) *
                self._latents_std.reshape(shape) +
                self._latents_mean.reshape(shape))

    def normalize_pixels(self, pixels: Array) -> Array:
        shape = (1, -1, 1, 1, 1)
        return ((pixels - self._pixel_mean.reshape(shape)) /
                self._pixel_std.reshape(shape))

    def denormalize_pixels(self, sample: Array) -> Array:
        shape = (1, -1, 1, 1, 1)
        return (sample * self._pixel_std.reshape(shape) +
                self._pixel_mean.reshape(shape))

    def enable_tiling(self, tile_sample_min_height: int | None = None,
                      tile_sample_min_width: int | None = None,
                      tile_sample_min_overlap_height: int | None = None,
                      tile_sample_min_overlap_width: int | None = None
                      ) -> None:
        self.use_tiling = True
        self.tile_sample_min_height = (tile_sample_min_height or
                                       self.tile_sample_min_height)
        self.tile_sample_min_width = (tile_sample_min_width or
                                      self.tile_sample_min_width)
        self.tile_sample_min_overlap_height = (
            tile_sample_min_overlap_height or
            self.tile_sample_min_overlap_height)
        self.tile_sample_min_overlap_width = (
            tile_sample_min_overlap_width or
            self.tile_sample_min_overlap_width)

    def disable_tiling(self) -> None:
        self.use_tiling = False

    # -- tiling helpers (reference :626-734) -------------------------------

    def _split_tiles(self, length: int, tile_size: int,
                     min_overlap: int) -> tuple[list[int], list[int],
                                                list[int]]:
        if tile_size >= length:
            return [0], [length], []
        num_tiles = math.ceil(length / tile_size)
        while tile_size * num_tiles - min_overlap * (num_tiles - 1) < length:
            num_tiles += 1
        overlaps = [min_overlap] * (num_tiles - 1)
        remaining = tile_size * num_tiles - sum(overlaps) - length
        for i in range(remaining // self.spatial_compression_ratio):
            overlaps[i % (num_tiles - 1)] += self.spatial_compression_ratio
        starts = [0]
        for i in range(num_tiles - 1):
            starts.append(starts[-1] + tile_size - overlaps[i])
        return starts, [tile_size] * num_tiles, overlaps

    def _stitch_tiles(self, tiles: list[list[Array]],
                      height_overlaps: list[int],
                      width_overlaps: list[int]) -> Array:
        rows = []
        for ri, row in enumerate(tiles):
            out_row = []
            for ci, tile in enumerate(row):
                if ri > 0:
                    tile = _blend(tiles[ri - 1][ci], tile,
                                  height_overlaps[ri - 1], -2)
                if ci > 0:
                    tile = _blend(row[ci - 1], tile, width_overlaps[ci - 1],
                                  -1)
                if ri < len(tiles) - 1:
                    tile = tile[..., :-height_overlaps[ri], :]
                if ci < len(row) - 1:
                    tile = tile[..., :, :-width_overlaps[ci]]
                out_row.append(tile)
            rows.append(jnp.concatenate(out_row, axis=-1))
        return jnp.concatenate(rows, axis=-2)

    # -- per-clip encode/decode (NCDHW in/out) ------------------------------

    def _encode_clip(self, x: Array) -> Array:
        def run(x_nc):
            h = self.encoder(x_nc.transpose(0, 2, 3, 4, 1))
            return self.quant_conv(h).transpose(0, 4, 1, 2, 3)

        if not self.use_tiling:
            return run(x)
        height, width = x.shape[-2:]
        ys, ylens, yovs = self._split_tiles(
            height, self.tile_sample_min_height,
            self.tile_sample_min_overlap_height)
        xs, xlens, xovs = self._split_tiles(
            width, self.tile_sample_min_width,
            self.tile_sample_min_overlap_width)
        rows = [[run(x[..., y0:y0 + yl, x0:x0 + xl])
                 for x0, xl in zip(xs, xlens)]
                for y0, yl in zip(ys, ylens)]
        r = self.spatial_compression_ratio
        return self._stitch_tiles(rows, [o // r for o in yovs],
                                  [o // r for o in xovs])

    def _decode_clip(self, z: Array) -> Array:
        def run(z_nc):
            h = self.post_quant_conv(z_nc.transpose(0, 2, 3, 4, 1))
            return self.decoder(h)

        if not self.use_tiling:
            return run(z)
        r = self.spatial_compression_ratio
        height, width = z.shape[-2] * r, z.shape[-1] * r
        ys, ylens, yovs = self._split_tiles(
            height, self.tile_sample_min_height,
            self.tile_sample_min_overlap_height)
        xs, xlens, xovs = self._split_tiles(
            width, self.tile_sample_min_width,
            self.tile_sample_min_overlap_width)
        rows = [[run(z[..., y0 // r:(y0 + yl) // r, x0 // r:(x0 + xl) // r])
                 for x0, xl in zip(xs, xlens)]
                for y0, yl in zip(ys, ylens)]
        return self._stitch_tiles(rows, yovs, xovs)

    # -- chunked encode/decode (reference :736-793) -------------------------

    def _encode(self, x: Array) -> Array:
        clip_length = self.config.clip_length
        num_frames = x.shape[2]
        if num_frames % clip_length != 0:
            reps = (-num_frames) % clip_length
            pad = jnp.repeat(x[:, :, -1:], reps, axis=2)
            x = jnp.concatenate([x, pad], axis=2)
        moments = jnp.concatenate([
            self._encode_clip(x[:, :, i * clip_length:(i + 1) * clip_length])
            for i in range(x.shape[2] // clip_length)
        ], axis=2)
        if self.config.token_drop > 0:
            moments = moments[:, :, :-self.config.token_drop]
        return moments

    def _decode(self, z: Array) -> Array:
        tokens_chunk_size = self.tokens_chunk_size
        token_drop = self.config.token_drop
        temporal_ratio = self.temporal_compression_ratio
        chunk_num_frames = tokens_chunk_size * temporal_ratio
        num_tokens = z.shape[2] + token_drop
        pad_tokens = (-num_tokens) % tokens_chunk_size
        num_chunks = ((num_tokens + pad_tokens) // tokens_chunk_size -
                      int(token_drop > 0))
        if pad_tokens > 0:
            z = jnp.concatenate(
                [z, jnp.repeat(z[:, :, -1:], pad_tokens, axis=2)], axis=2)

        decoded_chunks = []
        overlap = None
        for index in range(num_chunks):
            start = index * tokens_chunk_size
            clip = self._decode_clip(
                z[:, :, start:start + tokens_chunk_size + self.token_overlap])
            for oi in range(int(token_drop > 0) + 1):
                frame_start = oi * chunk_num_frames
                chunk = clip[:, :, frame_start:frame_start + chunk_num_frames]
                chunk = chunk[:, :, self.frame_pre_padding:]
                if oi == 0:
                    if overlap is not None:
                        chunk = _blend(overlap, chunk, self.frame_overlap,
                                       -3)
                    decoded_chunks.append(chunk)
                else:
                    overlap = chunk
        if overlap is not None:
            decoded_chunks.append(overlap)
        decoded = jnp.concatenate(decoded_chunks, axis=2)

        if pad_tokens > 0:
            intra_tail = self.config.clip_length % temporal_ratio
            num_tokens_before_pad = z.shape[2] - pad_tokens
            pad_frames = sum(
                intra_tail if intra_tail and
                (num_tokens_before_pad + offset) % tokens_chunk_size == 0
                else temporal_ratio for offset in range(pad_tokens))
            decoded = decoded[:, :, :-pad_frames]
        return decoded

    # -- public API ---------------------------------------------------------

    def encode(self, x: Array) -> DiagonalGaussianDistribution:
        """x [B, C, T, H, W] pixels -> posterior over [B, zC, T', H', W'].

        Note: moments split on the channel axis (axis 1, NCDHW), unlike the
        channels-last VAEs — wrap for the shared Gaussian helper."""
        moments = self._encode(x)
        # DiagonalGaussianDistribution splits on the LAST axis; ours is
        # channel-first here, so split manually.
        mean, logvar = jnp.split(moments, 2, axis=1)
        dist = DiagonalGaussianDistribution.__new__(
            DiagonalGaussianDistribution)
        dist.parameters = moments
        dist.mean = mean
        dist.logvar = jnp.clip(logvar, -30.0, 20.0)
        dist.std = jnp.exp(0.5 * dist.logvar)
        return dist

    def encode_keyframe(self, x: Array) -> DiagonalGaussianDistribution:
        """Single-frame conditioning encode, no chunk padding
        (reference :809-824)."""
        if x.ndim != 5 or x.shape[2] != 1:
            raise ValueError(
                f"keyframe must have exactly one frame, got {x.shape}")
        moments = self._encode_clip(x)
        mean, logvar = jnp.split(moments, 2, axis=1)
        dist = DiagonalGaussianDistribution.__new__(
            DiagonalGaussianDistribution)
        dist.parameters = moments
        dist.mean = mean
        dist.logvar = jnp.clip(logvar, -30.0, 20.0)
        dist.std = jnp.exp(0.5 * dist.logvar)
        return dist

    def decode(self, z: Array, **kwargs) -> Array:
        """z [B, zC, T', H', W'] -> pixels [B, C, T, H, W]."""
        return self._decode(z.astype(jnp.float32))


@dataclasses.dataclass
class MiniMaxH3VideoVAEConfig(ModelConfig):
    arch_config: MiniMaxH3VideoVAEArchConfig = dataclasses.field(
        default_factory=MiniMaxH3VideoVAEArchConfig)


EntryClass = AutoencoderKLMiniMaxH3
