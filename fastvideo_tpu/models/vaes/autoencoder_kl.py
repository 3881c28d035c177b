"""AutoencoderKL: the 2D image VAE (SD3.5 / SDXL family), TPU-native.

Behavioral reference: /root/reference/fastvideo/models/vaes/
autoencoder_kl.py (which wraps diffusers' AutoencoderKL): GroupNorm+SiLU
resnet blocks, strided-conv downsample with (0,1,0,1) asymmetric padding,
nearest-2x upsample, single-head mid attention over H*W tokens.
Channels-last (NHWC) internally; NCHW at the API boundary. SD3.5 checkpoints
set use_quant_conv = use_post_quant_conv = False.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.base import ModelConfig, VAEArchConfig
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.models.vaes.hunyuan import GroupNorm
from fastvideo_tpu.models.vaes.wan import DiagonalGaussianDistribution

Array = jax.Array

AUTOENCODER_KL_PARAM_NAMES_MAPPING: dict[str, str] = {
    r"^(.*)\.to_out\.0\.(weight|bias)$": r"\1.to_out.\2",
}


@dataclasses.dataclass
class AutoencoderKLArchConfig(VAEArchConfig):
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 1.5305
    shift_factor: float = 0.0609
    use_quant_conv: bool = False
    use_post_quant_conv: bool = False
    mid_block_add_attention: bool = True
    sample_size: int = 1024
    # per-channel latent statistics (GLM-Image style); None -> the scalar
    # shift_factor/scaling_factor convention applies
    latents_mean: tuple[float, ...] | None = None
    latents_std: tuple[float, ...] | None = None

    def latents_mean_arr(self):
        import numpy as np
        if self.latents_mean is None:
            return np.asarray([self.shift_factor], dtype=np.float32)
        return np.asarray(self.latents_mean, dtype=np.float32)

    def latents_std_arr(self):
        import numpy as np
        if self.latents_std is None:
            return np.asarray([1.0 / self.scaling_factor], dtype=np.float32)
        return np.asarray(self.latents_std, dtype=np.float32)

    @property
    def spatial_compression_ratio(self) -> int:
        return 2**(len(self.block_out_channels) - 1)

    @property
    def z_dim(self) -> int:
        return self.latent_channels


@dataclasses.dataclass
class AutoencoderKLConfig(ModelConfig):
    arch_config: AutoencoderKLArchConfig = dataclasses.field(
        default_factory=AutoencoderKLArchConfig)
    param_names_mapping: dict[str, str] = dataclasses.field(
        default_factory=lambda: dict(AUTOENCODER_KL_PARAM_NAMES_MAPPING))


class Conv2d(nnx.Module):
    """HWIO-kernel conv over NHWC tensors."""

    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: int = 3, stride: int = 1,
                 padding: int | tuple = 1, *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal(in_axis=(0, 1, 2), out_axis=3)
        self.weight = nnx.Param(
            init(rngs.params(),
                 (kernel_size, kernel_size, in_channels, out_channels),
                 param_dtype))
        self.bias = nnx.Param(jnp.zeros((out_channels,), param_dtype))
        self.stride = (stride, stride)
        if isinstance(padding, int):
            padding = ((padding, padding), (padding, padding))
        self.padding = padding

    def __call__(self, x: Array) -> Array:
        out = jax.lax.conv_general_dilated(
            x, self.weight.value.astype(x.dtype),
            window_strides=self.stride, padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + self.bias.value.astype(out.dtype)


class ResnetBlock2D(nnx.Module):
    def __init__(self, in_channels: int, out_channels: int, groups: int, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm1 = GroupNorm(groups, in_channels, **kw)
        self.conv1 = Conv2d(in_channels, out_channels, 3, 1, 1, **kw)
        self.norm2 = GroupNorm(groups, out_channels, **kw)
        self.conv2 = Conv2d(out_channels, out_channels, 3, 1, 1, **kw)
        self.conv_shortcut = (Conv2d(in_channels, out_channels, 1, 1, 0, **kw)
                              if in_channels != out_channels else None)

    def __call__(self, x: Array) -> Array:
        residual = x
        x = self.conv1(jax.nn.silu(self.norm1(x)))
        x = self.conv2(jax.nn.silu(self.norm2(x)))
        if self.conv_shortcut is not None:
            residual = self.conv_shortcut(residual)
        return x + residual


class VAEAttention2D(nnx.Module):
    """Single-head global attention over H*W tokens (diffusers Attention)."""

    def __init__(self, channels: int, groups: int, *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.group_norm = GroupNorm(groups, channels, **kw)
        self.to_q = Linear(channels, channels, **kw)
        self.to_k = Linear(channels, channels, **kw)
        self.to_v = Linear(channels, channels, **kw)
        self.to_out = Linear(channels, channels, **kw)

    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        residual = x
        xs = self.group_norm(x).reshape(b, h * w, c)
        out = jax.nn.dot_product_attention(
            self.to_q(xs)[:, :, None, :], self.to_k(xs)[:, :, None, :],
            self.to_v(xs)[:, :, None, :])
        out = self.to_out(out[:, :, 0])
        return out.reshape(b, h, w, c) + residual


class Downsample2D(nnx.Module):
    """Asymmetric-pad stride-2 conv (diffusers Downsample2D pad=(0,1,0,1))."""

    def __init__(self, channels: int, *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        self.conv = Conv2d(channels, channels, 3, 2, ((0, 1), (0, 1)),
                           param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        return self.conv(x)


class Upsample2D(nnx.Module):
    def __init__(self, channels: int, *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        self.conv = Conv2d(channels, channels, 3, 1, 1,
                           param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return self.conv(x)


class DownEncoderBlock2D(nnx.Module):
    def __init__(self, in_channels: int, out_channels: int, num_layers: int,
                 groups: int, add_downsample: bool, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.resnets = nnx.List([
            ResnetBlock2D(in_channels if i == 0 else out_channels,
                          out_channels, groups, **kw)
            for i in range(num_layers)
        ])
        self.downsamplers = (nnx.List([Downsample2D(out_channels, **kw)])
                             if add_downsample else None)

    def __call__(self, x: Array) -> Array:
        for resnet in self.resnets:
            x = resnet(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class UpDecoderBlock2D(nnx.Module):
    def __init__(self, in_channels: int, out_channels: int, num_layers: int,
                 groups: int, add_upsample: bool, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.resnets = nnx.List([
            ResnetBlock2D(in_channels if i == 0 else out_channels,
                          out_channels, groups, **kw)
            for i in range(num_layers)
        ])
        self.upsamplers = (nnx.List([Upsample2D(out_channels, **kw)])
                           if add_upsample else None)

    def __call__(self, x: Array) -> Array:
        for resnet in self.resnets:
            x = resnet(x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class MidBlock2D(nnx.Module):
    def __init__(self, channels: int, groups: int, add_attention: bool, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.resnets = nnx.List([
            ResnetBlock2D(channels, channels, groups, **kw),
            ResnetBlock2D(channels, channels, groups, **kw),
        ])
        self.attentions = nnx.List(
            [VAEAttention2D(channels, groups, **kw)] if add_attention else [])

    def __call__(self, x: Array) -> Array:
        x = self.resnets[0](x)
        if self.attentions:
            x = self.attentions[0](x)
        return self.resnets[1](x)


class Encoder2D(nnx.Module):
    def __init__(self, cfg: AutoencoderKLArchConfig, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        self.conv_in = Conv2d(cfg.in_channels, ch[0], 3, 1, 1, **kw)
        blocks = []
        out_c = ch[0]
        for i in range(len(ch)):
            in_c, out_c = out_c, ch[i]
            blocks.append(
                DownEncoderBlock2D(in_c, out_c, cfg.layers_per_block, g,
                                   add_downsample=(i < len(ch) - 1), **kw))
        self.down_blocks = nnx.List(blocks)
        self.mid_block = MidBlock2D(ch[-1], g, cfg.mid_block_add_attention,
                                    **kw)
        self.conv_norm_out = GroupNorm(g, ch[-1], **kw)
        self.conv_out = Conv2d(ch[-1], 2 * cfg.latent_channels, 3, 1, 1,
                               **kw)

    def __call__(self, x: Array) -> Array:
        x = self.conv_in(x)
        for block in self.down_blocks:
            x = block(x)
        x = self.mid_block(x)
        return self.conv_out(jax.nn.silu(self.conv_norm_out(x)))


class Decoder2D(nnx.Module):
    def __init__(self, cfg: AutoencoderKLArchConfig, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        self.conv_in = Conv2d(cfg.latent_channels, ch[-1], 3, 1, 1, **kw)
        self.mid_block = MidBlock2D(ch[-1], g, cfg.mid_block_add_attention,
                                    **kw)
        rev = list(reversed(ch))
        blocks = []
        out_c = rev[0]
        for i in range(len(ch)):
            in_c, out_c = out_c, rev[i]
            blocks.append(
                UpDecoderBlock2D(in_c, out_c, cfg.layers_per_block + 1, g,
                                 add_upsample=(i < len(ch) - 1), **kw))
        self.up_blocks = nnx.List(blocks)
        self.conv_norm_out = GroupNorm(g, ch[0], **kw)
        self.conv_out = Conv2d(ch[0], cfg.out_channels, 3, 1, 1, **kw)

    def __call__(self, x: Array) -> Array:
        x = self.conv_in(x)
        x = self.mid_block(x)
        for block in self.up_blocks:
            x = block(x)
        return self.conv_out(jax.nn.silu(self.conv_norm_out(x)))


class AutoencoderKL(nnx.Module):
    """2D image VAE; NCHW at the API boundary."""

    def __init__(self, config: AutoencoderKLArchConfig,
                 load_encoder: bool = True, load_decoder: bool = True, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.encoder = Encoder2D(config, **kw) if load_encoder else None
        self.decoder = Decoder2D(config, **kw) if load_decoder else None

    def normalize_latents(self, latents: Array) -> Array:
        cfg = self.config
        return (latents - cfg.shift_factor) * cfg.scaling_factor

    def denormalize_latents(self, latents: Array) -> Array:
        cfg = self.config
        return latents.astype(
            jnp.float32) / cfg.scaling_factor + cfg.shift_factor

    def encode(self, x: Array) -> DiagonalGaussianDistribution:
        assert self.encoder is not None
        moments = self.encoder(x.transpose(0, 2, 3, 1))
        return DiagonalGaussianDistribution(moments)

    def decode(self, z: Array, **kwargs) -> Array:
        assert self.decoder is not None
        out = self.decoder(z.transpose(0, 2, 3, 1))
        return out.astype(jnp.float32).transpose(0, 3, 1, 2)


EntryClass = AutoencoderKL
