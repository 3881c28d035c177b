"""HunyuanVideo-1.5 causal 3D VAE, TPU-native (channels-last).

Behavioral reference: /root/reference/fastvideo/models/vaes/hunyuan15vae.py
(:30-720): L2 RMS norms (F.normalize * sqrt(C) * gamma), DCAE
pixel-shuffle down/upsampling with channel-group shortcut averaging /
repeat_interleave, first-latent-frame temporal split, residual conv_in /
conv_out shortcuts, block-causal mid attention. 16x spatial / 4x temporal
compression; the encoder emits 2*latent moments directly (no quant conv).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.configs.models.base import ModelConfig, VAEArchConfig
from fastvideo_tpu.models.vaes.hunyuan import Conv1x1, HYCausalConv3d
from fastvideo_tpu.models.vaes.wan import DiagonalGaussianDistribution

Array = jax.Array

HUNYUAN15_VAE_PARAM_NAMES_MAPPING: dict[str, str] = {
    # every causal conv wraps nn.Conv3d in `.conv`
    r"^(.*)\.conv\.(weight|bias)$": r"\1.\2",
}


@dataclasses.dataclass
class Hunyuan15VAEArchConfig(VAEArchConfig):
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 32
    block_out_channels: tuple[int, ...] = (128, 256, 512, 1024, 1024)
    layers_per_block: int = 2
    temporal_compression_ratio: int = 4
    spatial_compression_ratio: int = 16
    downsample_match_channel: bool = True
    upsample_match_channel: bool = True
    scaling_factor: float = 1.0

    @property
    def z_dim(self) -> int:
        return self.latent_channels

    @property
    def scale_factor_temporal(self) -> int:
        return self.temporal_compression_ratio

    @property
    def scale_factor_spatial(self) -> int:
        return self.spatial_compression_ratio

    patch_size: int = 0


@dataclasses.dataclass
class Hunyuan15VAEConfig(ModelConfig):
    arch_config: Hunyuan15VAEArchConfig = dataclasses.field(
        default_factory=Hunyuan15VAEArchConfig)
    param_names_mapping: dict[str, str] = dataclasses.field(
        default_factory=lambda: dict(HUNYUAN15_VAE_PARAM_NAMES_MAPPING))


class HY15RMSNorm(nnx.Module):
    """F.normalize(x, dim=channel) * sqrt(C) * gamma (reference :63-87)."""

    def __init__(self, dim: int, *, param_dtype=jnp.float32, rngs: nnx.Rngs):
        del rngs
        self.scale = dim**0.5
        self.gamma = nnx.Param(jnp.ones((dim,), param_dtype))

    def __call__(self, x: Array) -> Array:
        xf = x.astype(jnp.float32)
        norm = jnp.linalg.norm(xf, axis=-1, keepdims=True)
        normed = xf / jnp.maximum(norm, 1e-12)
        return (normed * self.scale *
                self.gamma.value.astype(jnp.float32)).astype(x.dtype)


class HY15ResnetBlock(nnx.Module):
    def __init__(self, in_channels: int, out_channels: int | None = None, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        out_channels = out_channels or in_channels
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm1 = HY15RMSNorm(in_channels, **kw)
        self.conv1 = HYCausalConv3d(in_channels, out_channels, 3, 1, **kw)
        self.norm2 = HY15RMSNorm(out_channels, **kw)
        self.conv2 = HYCausalConv3d(out_channels, out_channels, 3, 1, **kw)
        self.conv_shortcut = (Conv1x1(in_channels, out_channels, **kw)
                              if in_channels != out_channels else None)

    def __call__(self, x: Array) -> Array:
        residual = x
        x = self.conv1(jax.nn.silu(self.norm1(x)))
        x = self.conv2(jax.nn.silu(self.norm2(x)))
        if self.conv_shortcut is not None:
            residual = self.conv_shortcut(residual)
        return x + residual


class HY15AttnBlock(nnx.Module):
    """Single-head block-causal attention; 1x1-conv projections."""

    def __init__(self, channels: int, *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm = HY15RMSNorm(channels, **kw)
        self.to_q = Conv1x1(channels, channels, **kw)
        self.to_k = Conv1x1(channels, channels, **kw)
        self.to_v = Conv1x1(channels, channels, **kw)
        self.proj_out = Conv1x1(channels, channels, **kw)

    def __call__(self, x: Array) -> Array:
        b, t, h, w, c = x.shape
        identity = x
        xs = self.norm(x)
        q = self.to_q(xs).reshape(b, t * h * w, c)
        k = self.to_k(xs).reshape(b, t * h * w, c)
        v = self.to_v(xs).reshape(b, t * h * w, c)
        frame = jnp.arange(t * h * w) // (h * w)
        mask = (frame[None, :] <= frame[:, None])[None, None]
        out = jax.nn.dot_product_attention(q[:, :, None], k[:, :, None],
                                           v[:, :, None], mask=mask)[:, :, 0]
        out = self.proj_out(out.reshape(b, t, h, w, c))
        return out + identity


def _shuffle_down(x: Array, r1: int) -> Array:
    """[B, r1*F, 2H, 2W, C] -> [B, F, H, W, r1*4*C] (channel order
    (r1, r2, r3, c), matching the torch rearrange)."""
    b, f, h, w, c = x.shape
    x = x.reshape(b, f // r1, r1, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, f // r1, h // 2, w // 2, r1 * 4 * c)


def _shuffle_up(x: Array, r1: int) -> Array:
    """[B, F, H, W, r1*4*C] -> [B, r1*F, 2H, 2W, C]."""
    b, f, h, w, pc = x.shape
    c = pc // (r1 * 4)
    x = x.reshape(b, f, h, w, r1, 2, 2, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, f * r1, h * 2, w * 2, c)


class HY15Downsample(nnx.Module):
    def __init__(self, in_channels: int, out_channels: int,
                 add_temporal: bool, *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        factor = 8 if add_temporal else 4
        self.conv = HYCausalConv3d(in_channels, out_channels // factor, 3, 1,
                                   param_dtype=param_dtype, rngs=rngs)
        self.add_temporal = add_temporal
        self.group_size = factor * in_channels // out_channels
        self.out_channels = out_channels

    def _avg_groups(self, x: Array, group: int) -> Array:
        b, f, hh, ww, c = x.shape
        return jnp.mean(x.reshape(b, f, hh, ww, c // group, group), axis=-1)

    def __call__(self, x: Array) -> Array:
        h = self.conv(x)
        if self.add_temporal:
            h_first = _shuffle_down(h[:, :1], 1)
            h_first = jnp.concatenate([h_first, h_first], axis=-1)
            h_next = _shuffle_down(h[:, 1:], 2)
            h = jnp.concatenate([h_first, h_next], axis=1)
            x_first = self._avg_groups(_shuffle_down(x[:, :1], 1),
                                       self.group_size // 2)
            x_next = self._avg_groups(_shuffle_down(x[:, 1:], 2),
                                      self.group_size)
            shortcut = jnp.concatenate([x_first, x_next], axis=1)
        else:
            h = _shuffle_down(h, 1)
            shortcut = self._avg_groups(_shuffle_down(x, 1), self.group_size)
        return h + shortcut


class HY15Upsample(nnx.Module):
    def __init__(self, in_channels: int, out_channels: int,
                 add_temporal: bool, *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        factor = 8 if add_temporal else 4
        self.conv = HYCausalConv3d(in_channels, out_channels * factor, 3, 1,
                                   param_dtype=param_dtype, rngs=rngs)
        self.add_temporal = add_temporal
        self.repeats = factor * out_channels // in_channels

    def __call__(self, x: Array) -> Array:
        h = self.conv(x)
        if self.add_temporal:
            h_first = _shuffle_up(h[:, :1], 1)
            h_first = h_first[..., :h_first.shape[-1] // 2]
            h_next = _shuffle_up(h[:, 1:], 2)
            h = jnp.concatenate([h_first, h_next], axis=1)
            # reference order: unpack (shuffle) FIRST, then channel repeat
            x_first = jnp.repeat(_shuffle_up(x[:, :1], 1),
                                 self.repeats // 2, axis=-1)
            x_next = jnp.repeat(_shuffle_up(x[:, 1:], 2), self.repeats,
                                axis=-1)
            shortcut = jnp.concatenate([x_first, x_next], axis=1)
        else:
            # reference swaps the order here: repeat channels, THEN unpack
            h = _shuffle_up(h, 1)
            shortcut = _shuffle_up(jnp.repeat(x, self.repeats, axis=-1), 1)
        return h + shortcut


class HY15MidBlock(nnx.Module):
    def __init__(self, channels: int, num_layers: int = 1, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.resnets = nnx.List(
            [HY15ResnetBlock(channels, channels, **kw)
             for _ in range(num_layers + 1)])
        self.attentions = nnx.List(
            [HY15AttnBlock(channels, **kw) for _ in range(num_layers)])

    def __call__(self, x: Array) -> Array:
        x = self.resnets[0](x)
        for attn, resnet in zip(self.attentions, self.resnets[1:]):
            x = attn(x)
            x = resnet(x)
        return x


class HY15DownBlock(nnx.Module):
    def __init__(self, in_channels: int, out_channels: int, num_layers: int,
                 downsample_out_channels: int | None, add_temporal: bool, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.resnets = nnx.List([
            HY15ResnetBlock(in_channels if i == 0 else out_channels,
                            out_channels, **kw) for i in range(num_layers)
        ])
        self.downsamplers = (nnx.List([
            HY15Downsample(out_channels, downsample_out_channels,
                           add_temporal, **kw)
        ]) if downsample_out_channels is not None else None)

    def __call__(self, x: Array) -> Array:
        for resnet in self.resnets:
            x = resnet(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class HY15UpBlock(nnx.Module):
    def __init__(self, in_channels: int, out_channels: int, num_layers: int,
                 upsample_out_channels: int | None, add_temporal: bool, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.resnets = nnx.List([
            HY15ResnetBlock(in_channels if i == 0 else out_channels,
                            out_channels, **kw) for i in range(num_layers)
        ])
        self.upsamplers = (nnx.List([
            HY15Upsample(out_channels, upsample_out_channels, add_temporal,
                         **kw)
        ]) if upsample_out_channels is not None else None)

    def __call__(self, x: Array) -> Array:
        for resnet in self.resnets:
            x = resnet(x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class HunyuanVideo15Encoder3D(nnx.Module):
    def __init__(self, cfg: Hunyuan15VAEArchConfig, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        ch = cfg.block_out_channels
        out_channels = cfg.latent_channels * 2
        self.group_size = ch[-1] // out_channels
        self.conv_in = HYCausalConv3d(cfg.in_channels, ch[0], 3, 1, **kw)
        blocks = []
        input_channel = ch[0]
        n_spatial = math.log2(cfg.spatial_compression_ratio)
        n_temporal_start = math.log2(cfg.spatial_compression_ratio //
                                     cfg.temporal_compression_ratio)
        for i in range(len(ch)):
            add_spatial = i < n_spatial
            output_channel = ch[i]
            if add_spatial:
                add_temporal = i >= n_temporal_start
                down_out = (ch[i + 1] if cfg.downsample_match_channel
                            else output_channel)
                blocks.append(
                    HY15DownBlock(input_channel, output_channel,
                                  cfg.layers_per_block, down_out,
                                  add_temporal, **kw))
                input_channel = down_out
            else:
                blocks.append(
                    HY15DownBlock(input_channel, output_channel,
                                  cfg.layers_per_block, None, False, **kw))
                input_channel = output_channel
        self.down_blocks = nnx.List(blocks)
        self.mid_block = HY15MidBlock(ch[-1], **kw)
        self.norm_out = HY15RMSNorm(ch[-1], **kw)
        self.conv_out = HYCausalConv3d(ch[-1], out_channels, 3, 1, **kw)

    def __call__(self, x: Array) -> Array:
        x = self.conv_in(x)
        for block in self.down_blocks:
            x = block(x)
        x = self.mid_block(x)
        b, f, hh, ww, c = x.shape
        shortcut = jnp.mean(
            x.reshape(b, f, hh, ww, c // self.group_size, self.group_size),
            axis=-1)
        x = self.conv_out(jax.nn.silu(self.norm_out(x)))
        return x + shortcut


class HunyuanVideo15Decoder3D(nnx.Module):
    def __init__(self, cfg: Hunyuan15VAEArchConfig, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        ch = tuple(reversed(cfg.block_out_channels))
        self.repeat = ch[0] // cfg.latent_channels
        self.conv_in = HYCausalConv3d(cfg.latent_channels, ch[0], 3, 1, **kw)
        self.mid_block = HY15MidBlock(ch[0], **kw)
        blocks = []
        input_channel = ch[0]
        n_spatial = math.log2(cfg.spatial_compression_ratio)
        n_temporal = math.log2(cfg.temporal_compression_ratio)
        for i in range(len(ch)):
            output_channel = ch[i]
            add_spatial = i < n_spatial
            add_temporal = i < n_temporal
            if add_spatial or add_temporal:
                up_out = (ch[i + 1] if cfg.upsample_match_channel
                          else output_channel)
                blocks.append(
                    HY15UpBlock(input_channel, output_channel,
                                cfg.layers_per_block + 1, up_out,
                                add_temporal, **kw))
                input_channel = up_out
            else:
                blocks.append(
                    HY15UpBlock(input_channel, output_channel,
                                cfg.layers_per_block + 1, None, False, **kw))
                input_channel = output_channel
        self.up_blocks = nnx.List(blocks)
        self.norm_out = HY15RMSNorm(ch[-1], **kw)
        self.conv_out = HYCausalConv3d(ch[-1], cfg.out_channels, 3, 1, **kw)

    def __call__(self, x: Array) -> Array:
        x = self.conv_in(x) + jnp.repeat(x, self.repeat, axis=-1)
        x = self.mid_block(x)
        for block in self.up_blocks:
            x = block(x)
        return self.conv_out(jax.nn.silu(self.norm_out(x)))


class AutoencoderKLHunyuanVideo15(nnx.Module):
    """HunyuanVideo-1.5 VAE (reference :623-720); NCDHW at the boundary."""

    def __init__(self, config: Hunyuan15VAEArchConfig,
                 load_encoder: bool = True, load_decoder: bool = True, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.encoder = (HunyuanVideo15Encoder3D(config, **kw)
                        if load_encoder else None)
        self.decoder = (HunyuanVideo15Decoder3D(config, **kw)
                        if load_decoder else None)

    def normalize_latents(self, latents: Array) -> Array:
        return latents * self.config.scaling_factor

    def denormalize_latents(self, latents: Array) -> Array:
        return latents.astype(jnp.float32) / self.config.scaling_factor

    def encode(self, x: Array) -> DiagonalGaussianDistribution:
        assert self.encoder is not None
        moments = self.encoder(x.transpose(0, 2, 3, 4, 1))
        return DiagonalGaussianDistribution(moments)

    def decode(self, z: Array, **kwargs) -> Array:
        assert self.decoder is not None
        out = self.decoder(z.transpose(0, 2, 3, 4, 1))
        return out.astype(jnp.float32).transpose(0, 4, 1, 2, 3)


EntryClass = AutoencoderKLHunyuanVideo15
