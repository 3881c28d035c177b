"""HunyuanVideo-1.5 latent super-resolution upsamplers.

Behavioral reference: /root/reference/fastvideo/models/upsamplers/
hunyuan15.py (:35-169) + configs/models/upsamplers/hunyuan15.py: a
residual causal-conv refiner for the 720p SR stage and a VAE-decoder-like
resnet stack (bilinear pre-resize + channel repeat-interleave residual
conv_in) for the 1080p stage. Reuses the hy1.5 VAE's causal conv and
L2 RMS norm. NCDHW at the boundary.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.models.vaes.hunyuan import Conv1x1, HYCausalConv3d
from fastvideo_tpu.models.vaes.hunyuan15 import HY15RMSNorm

Array = jax.Array

HY15_UPSAMPLER_PARAM_NAMES_MAPPING: dict[str, str] = {
    # torch Sequential block: [conv, SiLU, conv, SiLU, conv]
    r"^(.*)\.block\.0\.conv\.(weight|bias)$": r"\1.conv_a.\2",
    r"^(.*)\.block\.2\.conv\.(weight|bias)$": r"\1.conv_b.\2",
    r"^(.*)\.block\.4\.conv\.(weight|bias)$": r"\1.conv_c.\2",
    r"^(.*)\.conv\.(weight|bias)$": r"\1.\2",
}


@dataclasses.dataclass
class SRTo720pUpsamplerConfig:
    in_channels: int = 0
    out_channels: int = 0
    hidden_channels: int = 64
    num_blocks: int = 6
    global_residual: bool = False


@dataclasses.dataclass
class SRTo1080pUpsamplerConfig:
    z_channels: int = 0
    out_channels: int = 0
    block_out_channels: tuple[int, ...] = (0, 0)
    num_res_blocks: int = 2
    is_residual: bool = False


class HY15UpsamplerResnetBlock(nnx.Module):
    """(reference HunyuanVideo15ResnetBlock :35-71)."""

    def __init__(self, in_channels: int, out_channels: int | None = None, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        out_channels = out_channels or in_channels
        self.norm1 = HY15RMSNorm(in_channels, **kw)
        self.conv1 = HYCausalConv3d(in_channels, out_channels, 3, 1, **kw)
        self.norm2 = HY15RMSNorm(out_channels, **kw)
        self.conv2 = HYCausalConv3d(out_channels, out_channels, 3, 1, **kw)
        self.nin_shortcut = (Conv1x1(in_channels, out_channels, **kw)
                             if in_channels != out_channels else None)

    def __call__(self, x: Array) -> Array:
        h = self.conv1(jax.nn.silu(self.norm1(x)))
        h = self.conv2(jax.nn.silu(self.norm2(h)))
        if self.nin_shortcut is not None:
            x = self.nin_shortcut(x)
        return x + h


class SRResidualCausalBlock3D(nnx.Module):
    """conv-silu-conv-silu-conv + skip (reference :73-85)."""

    def __init__(self, channels: int, *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.conv_a = HYCausalConv3d(channels, channels, 3, 1, **kw)
        self.conv_b = HYCausalConv3d(channels, channels, 3, 1, **kw)
        self.conv_c = HYCausalConv3d(channels, channels, 3, 1, **kw)

    def __call__(self, x: Array) -> Array:
        h = jax.nn.silu(self.conv_a(x))
        h = jax.nn.silu(self.conv_b(h))
        return x + self.conv_c(h)


class SRTo720pUpsampler(nnx.Module):
    """(reference :88-109); latent-space refiner."""

    def __init__(self, config: SRTo720pUpsamplerConfig, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.in_conv = HYCausalConv3d(config.in_channels,
                                      config.hidden_channels, 3, 1, **kw)
        self.blocks = nnx.List([
            SRResidualCausalBlock3D(config.hidden_channels, **kw)
            for _ in range(config.num_blocks)
        ])
        self.out_conv = HYCausalConv3d(config.hidden_channels,
                                       config.out_channels, 3, 1, **kw)

    def __call__(self, x: Array) -> Array:
        """x [B, C, T, H, W] -> [B, C_out, T, H, W]."""
        residual = x
        y = x.transpose(0, 2, 3, 4, 1)  # NDHWC (conv layout)
        y = self.in_conv(y)
        for blk in self.blocks:
            y = blk(y)
        y = self.out_conv(y).transpose(0, 4, 1, 2, 3)
        if self.config.global_residual and y.shape == residual.shape:
            y = y + residual
        return y


class SRTo1080pUpsampler(nnx.Module):
    """(reference :111-169); bilinear pre-resize + resnet stack."""

    def __init__(self, config: SRTo1080pUpsamplerConfig, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        block_in = config.block_out_channels[0]
        self.conv_in = HYCausalConv3d(config.z_channels, block_in, 3, 1,
                                      **kw)
        ups = []
        for ch in config.block_out_channels:
            blocks = []
            for _ in range(config.num_res_blocks + 1):
                blocks.append(HY15UpsamplerResnetBlock(block_in, ch, **kw))
                block_in = ch
            ups.append(nnx.List(blocks))
        self.up = nnx.List(
            [_UpLevel(blocks) for blocks in ups])
        self.norm_out = HY15RMSNorm(block_in, **kw)
        self.conv_out = HYCausalConv3d(block_in, config.out_channels, 3, 1,
                                       **kw)

    def __call__(self, z: Array,
                 target_shape: tuple[int, int] | None = None) -> Array:
        """z [B, C, T, H, W]; optional bilinear pre-resize to
        ``target_shape`` (H, W)."""
        b, c, t, h, w = z.shape
        if target_shape is not None and (h, w) != tuple(target_shape):
            th, tw = target_shape
            z = jax.image.resize(z, (b, c, t, th, tw), "bilinear")
        x = z.transpose(0, 2, 3, 4, 1)  # NDHWC
        repeats = self.config.block_out_channels[0] // \
            self.config.z_channels
        h_out = self.conv_in(x) + jnp.repeat(x, repeats, axis=-1)
        for level in self.up:
            for blk in level.block:
                h_out = blk(h_out)
        h_out = self.conv_out(jax.nn.silu(self.norm_out(h_out)))
        return h_out.transpose(0, 4, 1, 2, 3)


class _UpLevel(nnx.Module):
    def __init__(self, blocks):
        self.block = blocks


EntryClass = (SRTo720pUpsampler, SRTo1080pUpsampler)
