"""LTX-2 latent upsampler (spatial / temporal), TPU-native.

Behavioral reference: /root/reference/fastvideo/models/upsamplers/
ltx2_upsampler.py (:16-319): initial conv + N res blocks, a pixel-shuffle
(or rational blur-resampled) upscale, N more res blocks, final conv; all
wrapped by per-channel latent (un)normalization from the video VAE.

Layout here is channels-last ([B, T, H, W, C]) so the convs map straight
onto the MXU without transposes; pixel-shuffle is a reshape+transpose
XLA folds into the surrounding convs' layouts.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.base import ArchConfig, ModelConfig
from fastvideo_tpu.models.vaes.autoencoder_kl import Conv2d
from fastvideo_tpu.models.vaes.ltx2 import LTXCausalConv3d

Array = jax.Array


@dataclasses.dataclass
class LTX2UpsamplerArchConfig(ArchConfig):
    in_channels: int = 128
    mid_channels: int = 512
    num_blocks_per_stage: int = 4
    dims: int = 3
    spatial_upsample: bool = True
    temporal_upsample: bool = False
    spatial_scale: float = 2.0
    rational_resampler: bool = False


LTX2_UPSAMPLER_PARAM_NAMES_MAPPING = {
    # the HF wrapper nests everything under ``model.``
    r"^model\.(.*)$": r"\1",
    # GroupNorm weight/bias -> nnx scale/bias
    r"^(.*norm\d*)\.weight$": r"\1.scale",
    # torch Sequential upsampler: index 0 is the conv
    r"^upsampler\.0\.(weight|bias)$": r"upsampler_conv.\1",
    # 'upsampler.conv' only exists in rational_resampler checkpoints
    # (reference builds self.upsampler = SpatialRationalResampler whose
    # conv is .conv) — route it to the flax rational resampler
    r"^upsampler\.conv\.(weight|bias)$": r"rational.conv.\1",
    # tiny-fixture exports wrap ZeroPadConv3d as `.conv.` (HF-style for
    # LTXCausalConv3d); the real upsampler uses bare nn.Conv3d names
    r"^((?:initial_|final_|upsampler_)conv)\.conv\.(weight|bias)$":
    r"\1.\2",
    r"^((?:post_upsample_)?res_blocks\.\d+\.conv\d)\.conv\.(weight|bias)$":
    r"\1.\2",
}


@dataclasses.dataclass
class LTX2UpsamplerConfig(ModelConfig):
    arch_config: LTX2UpsamplerArchConfig = dataclasses.field(
        default_factory=LTX2UpsamplerArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(LTX2_UPSAMPLER_PARAM_NAMES_MAPPING))


class ZeroPadConv3d(LTXCausalConv3d):
    """3x3x3 conv with zero SAME padding on T/H/W (torch Conv3d
    padding=1) — unlike the parent's causal/replicate temporal pad."""

    def __call__(self, x: Array, causal: bool = False) -> Array:
        kt, kh, kw = self.kernel_size
        pads = ((0, 0), (kt // 2, kt // 2), (kh // 2, kh // 2),
                (kw // 2, kw // 2), (0, 0))
        x = jnp.pad(x, pads)
        out = jax.lax.conv_general_dilated(
            x, self.weight.value.astype(x.dtype),
            window_strides=self.stride, padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return out + self.bias.value.astype(out.dtype)


def pixel_shuffle_3d(x: Array, p: tuple[int, int, int]) -> Array:
    """[B,T,H,W,C*p1*p2*p3] -> [B,T*p1,H*p2,W*p3,C]; channel index
    (c, p1, p2, p3) matches the reference einops pattern."""
    b, t, h, w, cp = x.shape
    p1, p2, p3 = p
    c = cp // (p1 * p2 * p3)
    x = x.reshape(b, t, h, w, c, p1, p2, p3)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, t * p1, h * p2, w * p3, c)


def pixel_shuffle_2d(x: Array, p: tuple[int, int]) -> Array:
    """[..., H, W, C*p1*p2] -> [..., H*p1, W*p2, C]."""
    *lead, h, w, cp = x.shape
    p1, p2 = p
    c = cp // (p1 * p2)
    x = x.reshape(*lead, h, w, c, p1, p2)
    ndim = len(lead)
    perm = (*range(ndim), ndim, ndim + 3, ndim + 1, ndim + 4, ndim + 2)
    x = x.transpose(*perm)
    return x.reshape(*lead, h * p1, w * p2, c)


def blur_downsample(x: Array, stride: int, kernel_size: int = 5) -> Array:
    """Anti-aliased HxW decimation with a fixed binomial kernel
    (reference BlurDownsample; depthwise, SAME padding)."""
    if stride == 1:
        return x
    k = jnp.asarray([math.comb(kernel_size - 1, i)
                     for i in range(kernel_size)], jnp.float32)
    k2 = jnp.outer(k, k)
    k2 = (k2 / k2.sum()).astype(x.dtype)
    *lead, h, w, c = x.shape
    xs = x.reshape(-1, h, w, c)
    kern = jnp.tile(k2[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
    pad = kernel_size // 2
    out = jax.lax.conv_general_dilated(
        xs, kern, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    return out.reshape(*lead, *out.shape[1:])


_RATIONAL = {0.75: (3, 4), 1.5: (3, 2), 2.0: (2, 1), 4.0: (4, 1)}


class SpatialRationalResampler(nnx.Module):
    """Up by `num` (conv + 2D pixel shuffle), blur-down by `den`
    (reference SpatialRationalResampler)."""

    def __init__(self, mid_channels: int, scale: float, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        if float(scale) not in _RATIONAL:
            raise ValueError(f"Unsupported scale {scale}; one of "
                             f"{sorted(_RATIONAL)}")
        self.num, self.den = _RATIONAL[float(scale)]
        self.conv = Conv2d(mid_channels, (self.num**2) * mid_channels,
                           kernel_size=3, padding=1,
                           param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        b, t, h, w, c = x.shape
        x = self.conv(x.reshape(b * t, h, w, c))
        x = pixel_shuffle_2d(x, (self.num, self.num))
        x = blur_downsample(x, self.den)
        return x.reshape(b, t, *x.shape[1:])


class UpsamplerResBlock(nnx.Module):
    """conv3x3 -> GN(32) -> SiLU -> conv3x3 -> GN(32) -> SiLU(x + r)."""

    def __init__(self, channels: int, *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        self.conv1 = ZeroPadConv3d(channels, channels, 3,
                                   param_dtype=param_dtype, rngs=rngs)
        self.norm1 = nnx.GroupNorm(channels, num_groups=32,
                                   param_dtype=param_dtype, rngs=rngs)
        self.conv2 = ZeroPadConv3d(channels, channels, 3,
                                   param_dtype=param_dtype, rngs=rngs)
        self.norm2 = nnx.GroupNorm(channels, num_groups=32,
                                   param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        r = x
        x = jax.nn.silu(self.norm1(self.conv1(x)))
        x = self.norm2(self.conv2(x))
        return jax.nn.silu(x + r)


class LatentUpsampler(nnx.Module):
    """reference LatentUpsampler (:156-258), dims=3 layout."""

    def __init__(self, config: LTX2UpsamplerArchConfig, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        cfg = config
        if cfg.dims != 3:
            raise NotImplementedError(
                "video latents are 3-D; dims=2 checkpoints are image-only")
        self.config = cfg
        self.initial_conv = ZeroPadConv3d(cfg.in_channels, cfg.mid_channels,
                                          3, param_dtype=param_dtype,
                                          rngs=rngs)
        self.initial_norm = nnx.GroupNorm(cfg.mid_channels, num_groups=32,
                                          param_dtype=param_dtype, rngs=rngs)
        self.res_blocks = nnx.List([
            UpsamplerResBlock(cfg.mid_channels, param_dtype=param_dtype,
                              rngs=rngs)
            for _ in range(cfg.num_blocks_per_stage)
        ])
        if not cfg.spatial_upsample and not cfg.temporal_upsample:
            raise ValueError("need spatial_upsample or temporal_upsample")
        # single assignment per attribute (nnx data/static inference)
        if cfg.spatial_upsample and cfg.rational_resampler and \
                not cfg.temporal_upsample:
            self.rational = SpatialRationalResampler(
                cfg.mid_channels, cfg.spatial_scale,
                param_dtype=param_dtype, rngs=rngs)
        else:
            self.rational = nnx.data(None)
        if cfg.spatial_upsample and cfg.temporal_upsample:
            self.upsampler_conv = ZeroPadConv3d(
                cfg.mid_channels, 8 * cfg.mid_channels, 3,
                param_dtype=param_dtype, rngs=rngs)
        elif cfg.temporal_upsample:
            self.upsampler_conv = ZeroPadConv3d(
                cfg.mid_channels, 2 * cfg.mid_channels, 3,
                param_dtype=param_dtype, rngs=rngs)
        elif cfg.rational_resampler:
            self.upsampler_conv = nnx.data(None)
        else:
            self.upsampler_conv = Conv2d(
                cfg.mid_channels, 4 * cfg.mid_channels, kernel_size=3,
                padding=1, param_dtype=param_dtype, rngs=rngs)
        self.post_upsample_res_blocks = nnx.List([
            UpsamplerResBlock(cfg.mid_channels, param_dtype=param_dtype,
                              rngs=rngs)
            for _ in range(cfg.num_blocks_per_stage)
        ])
        self.final_conv = ZeroPadConv3d(cfg.mid_channels, cfg.in_channels,
                                        3, param_dtype=param_dtype,
                                        rngs=rngs)

    def __call__(self, latent: Array) -> Array:
        """latent [B, T, H, W, C] (un-normalized) -> upsampled latent."""
        cfg = self.config
        x = jax.nn.silu(self.initial_norm(self.initial_conv(latent)))
        for block in self.res_blocks:
            x = block(x)
        if cfg.spatial_upsample and cfg.temporal_upsample:
            x = pixel_shuffle_3d(self.upsampler_conv(x), (2, 2, 2))
            x = x[:, 1:]
        elif cfg.temporal_upsample:
            # 1-D shuffle on T, then drop the duplicated first frame
            b, t, h, w, cp = (y := self.upsampler_conv(x)).shape
            y = y.reshape(b, t, h, w, cp // 2, 2)
            y = y.transpose(0, 1, 5, 2, 3, 4).reshape(b, t * 2, h, w,
                                                      cp // 2)
            x = y[:, 1:]
        elif self.rational is not None:
            x = self.rational(x)
        else:
            b, t, h, w, c = x.shape
            x = self.upsampler_conv(x.reshape(b * t, h, w, c))
            x = pixel_shuffle_2d(x, (2, 2))
            x = x.reshape(b, t, *x.shape[1:])
        for block in self.post_upsample_res_blocks:
            x = block(x)
        return self.final_conv(x)


def upsample_video(latent: Array, vae, upsampler: LatentUpsampler) -> Array:
    """Denormalize by the VAE's per-channel stats, upsample, renormalize
    (reference upsample_video:283-297). latent: [B, T, H, W, C]."""
    stats = vae.per_channel_statistics
    latent = stats.un_normalize(latent)
    latent = upsampler(latent)
    return stats.normalize(latent)
