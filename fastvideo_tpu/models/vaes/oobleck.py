"""Stable Audio "Oobleck" VAE, TPU-native.

Behavioral reference: /root/reference/fastvideo/models/vaes/oobleck.py
(:29-285): 5-stage weight-normed Conv1d autoencoder with Snake
activations (x + sin^2(alpha x)/beta, log-scale parms) and a
diagonal-Gaussian bottleneck whose std is softplus(scale) + 1e-4.
Weight-norm is kept as (weight_g, weight_v) pairs so checkpoints assign
directly; the normalized kernel is materialized per call (XLA folds it).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

Array = jax.Array


class Snake1d(nnx.Module):
    """(reference :29-46)."""

    def __init__(self, hidden_dim: int, logscale: bool = True, *,
                 param_dtype=jnp.float32, rngs=None):
        del rngs
        self.alpha = nnx.Param(jnp.zeros((1, hidden_dim, 1), param_dtype))
        self.beta = nnx.Param(jnp.zeros((1, hidden_dim, 1), param_dtype))
        self.logscale = logscale

    def __call__(self, x: Array) -> Array:
        alpha = self.alpha.value.astype(x.dtype)
        beta = self.beta.value.astype(x.dtype)
        if self.logscale:
            alpha = jnp.exp(alpha)
            beta = jnp.exp(beta)
        return x + (1.0 / (beta + 1e-9)) * jnp.square(
            jnp.sin(alpha * x))


class WNConv1d(nnx.Module):
    """weight-normed Conv1d; params in torch layout (g [O,1,1],
    v [O,I,K])."""

    def __init__(self, in_ch: int, out_ch: int, kernel_size: int,
                 stride: int = 1, padding: int = 0, dilation: int = 1,
                 bias: bool = True, *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        v = init(rngs.params(), (out_ch, in_ch, kernel_size), param_dtype)
        self.weight_v = nnx.Param(v)
        self.weight_g = nnx.Param(
            jnp.linalg.norm(v.reshape(out_ch, -1), axis=1).reshape(
                out_ch, 1, 1).astype(param_dtype))
        self.bias = nnx.Param(jnp.zeros((out_ch,), param_dtype)) if bias \
            else None
        self.stride = stride
        self.padding = padding
        self.dilation = dilation

    def _weight(self, dtype) -> Array:
        v = self.weight_v.value.astype(jnp.float32)
        g = self.weight_g.value.astype(jnp.float32)
        norm = jnp.linalg.norm(v.reshape(v.shape[0], -1), axis=1).reshape(
            -1, 1, 1)
        return (g * v / norm).astype(dtype)

    def __call__(self, x: Array) -> Array:
        w = self._weight(x.dtype)
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NCH", "OIH", "NCH"))
        if self.bias is not None:
            out = out + self.bias.value.astype(x.dtype)[None, :, None]
        return out


class WNConvTranspose1d(nnx.Module):
    """weight-normed ConvTranspose1d; v in torch layout [I, O, K]."""

    def __init__(self, in_ch: int, out_ch: int, kernel_size: int,
                 stride: int = 1, padding: int = 0, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        v = init(rngs.params(), (in_ch, out_ch, kernel_size), param_dtype)
        self.weight_v = nnx.Param(v)
        # torch weight_norm defaults to dim=0, which for ConvTranspose1d's
        # [I, O, K] weight is the INPUT-channel axis: g shape [I, 1, 1]
        self.weight_g = nnx.Param(
            jnp.linalg.norm(v.reshape(in_ch, -1),
                            axis=1).reshape(in_ch, 1, 1).astype(param_dtype))
        self.bias = nnx.Param(jnp.zeros((out_ch,), param_dtype))
        self.stride = stride
        self.padding = padding
        self.kernel_size = kernel_size

    def __call__(self, x: Array) -> Array:
        v = self.weight_v.value.astype(jnp.float32)
        g = self.weight_g.value.astype(jnp.float32)
        norm = jnp.linalg.norm(v.reshape(v.shape[0], -1),
                               axis=1).reshape(-1, 1, 1)
        w = (g * v / norm).astype(x.dtype)  # [I, O, K]
        # transposed conv == lhs-dilated conv with flipped kernel
        w_conv = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # [O, I, K]
        pad = self.kernel_size - 1 - self.padding
        out = jax.lax.conv_general_dilated(
            x, w_conv, window_strides=(1,), padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NCH", "OIH", "NCH"))
        return out + self.bias.value.astype(x.dtype)[None, :, None]


class OobleckResidualUnit(nnx.Module):
    def __init__(self, dim: int = 16, dilation: int = 1, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        pad = ((7 - 1) * dilation) // 2
        self.snake1 = Snake1d(dim, **kw)
        self.conv1 = WNConv1d(dim, dim, 7, dilation=dilation, padding=pad,
                              **kw)
        self.snake2 = Snake1d(dim, **kw)
        self.conv2 = WNConv1d(dim, dim, 1, **kw)

    def __call__(self, x: Array) -> Array:
        out = self.conv2(self.snake2(self.conv1(self.snake1(x))))
        pad = (x.shape[-1] - out.shape[-1]) // 2
        if pad > 0:
            x = x[..., pad:-pad]
        return x + out


class OobleckEncoderBlock(nnx.Module):
    def __init__(self, input_dim: int, output_dim: int, stride: int = 1, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.res_unit1 = OobleckResidualUnit(input_dim, 1, **kw)
        self.res_unit2 = OobleckResidualUnit(input_dim, 3, **kw)
        self.res_unit3 = OobleckResidualUnit(input_dim, 9, **kw)
        self.snake1 = Snake1d(input_dim, **kw)
        self.conv1 = WNConv1d(input_dim, output_dim, 2 * stride,
                              stride=stride,
                              padding=math.ceil(stride / 2), **kw)

    def __call__(self, x: Array) -> Array:
        x = self.res_unit1(x)
        x = self.res_unit2(x)
        x = self.snake1(self.res_unit3(x))
        return self.conv1(x)


class OobleckDecoderBlock(nnx.Module):
    def __init__(self, input_dim: int, output_dim: int, stride: int = 1, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.snake1 = Snake1d(input_dim, **kw)
        self.conv_t1 = WNConvTranspose1d(input_dim, output_dim, 2 * stride,
                                         stride=stride,
                                         padding=math.ceil(stride / 2),
                                         **kw)
        self.res_unit1 = OobleckResidualUnit(output_dim, 1, **kw)
        self.res_unit2 = OobleckResidualUnit(output_dim, 3, **kw)
        self.res_unit3 = OobleckResidualUnit(output_dim, 9, **kw)

    def __call__(self, x: Array) -> Array:
        x = self.conv_t1(self.snake1(x))
        return self.res_unit3(self.res_unit2(self.res_unit1(x)))


@dataclasses.dataclass
class OobleckPosterior:
    mean: Array
    std: Array

    def sample(self, noise: Array | None = None) -> Array:
        if noise is None:
            noise = jax.random.normal(jax.random.PRNGKey(0),
                                      self.mean.shape, self.mean.dtype)
        return self.mean + self.std * noise

    def mode(self) -> Array:
        return self.mean


class OobleckEncoder(nnx.Module):
    def __init__(self, encoder_hidden_size: int, audio_channels: int,
                 downsampling_ratios, channel_multiples, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        cm = [1] + list(channel_multiples)
        self.conv1 = WNConv1d(audio_channels, encoder_hidden_size, 7,
                              padding=3, **kw)
        self.block = nnx.List([
            OobleckEncoderBlock(encoder_hidden_size * cm[i],
                                encoder_hidden_size * cm[i + 1], s, **kw)
            for i, s in enumerate(downsampling_ratios)
        ])
        d_model = encoder_hidden_size * cm[-1]
        self.snake1 = Snake1d(d_model, **kw)
        self.conv2 = WNConv1d(d_model, encoder_hidden_size, 3, padding=1,
                              **kw)

    def __call__(self, x: Array) -> Array:
        x = self.conv1(x)
        for m in self.block:
            x = m(x)
        return self.conv2(self.snake1(x))


class OobleckDecoder(nnx.Module):
    def __init__(self, channels: int, input_channels: int,
                 audio_channels: int, upsampling_ratios, channel_multiples,
                 *, param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        cm = [1] + list(channel_multiples)
        strides = list(upsampling_ratios)
        self.conv1 = WNConv1d(input_channels, channels * cm[-1], 7,
                              padding=3, **kw)
        self.block = nnx.List([
            OobleckDecoderBlock(channels * cm[len(strides) - i],
                                channels * cm[len(strides) - i - 1], s, **kw)
            for i, s in enumerate(strides)
        ])
        self.snake1 = Snake1d(channels, **kw)
        self.conv2 = WNConv1d(channels, audio_channels, 7, padding=3,
                              bias=False, **kw)

    def __call__(self, x: Array) -> Array:
        x = self.conv1(x)
        for m in self.block:
            x = m(x)
        return self.conv2(self.snake1(x))


from fastvideo_tpu.configs.models.base import ArchConfig


@dataclasses.dataclass
class OobleckVAEArchConfig(ArchConfig):
    encoder_hidden_size: int = 128
    downsampling_ratios: tuple[int, ...] = (2, 4, 4, 8, 8)
    channel_multiples: tuple[int, ...] = (1, 2, 4, 8, 16)
    decoder_channels: int = 128
    decoder_input_channels: int = 64
    audio_channels: int = 2
    sampling_rate: int = 44100


class OobleckVAE(nnx.Module):
    """(reference :215-285)."""

    def __init__(self, config: OobleckVAEArchConfig | None = None, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        config = config or OobleckVAEArchConfig()
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.hop_length = int(np.prod(config.downsampling_ratios))
        self.encoder = OobleckEncoder(config.encoder_hidden_size,
                                      config.audio_channels,
                                      config.downsampling_ratios,
                                      config.channel_multiples, **kw)
        self.decoder = OobleckDecoder(config.decoder_channels,
                                      config.decoder_input_channels,
                                      config.audio_channels,
                                      tuple(reversed(
                                          config.downsampling_ratios)),
                                      config.channel_multiples, **kw)

    def encode(self, x: Array) -> OobleckPosterior:
        params = self.encoder(x)
        mean, scale = jnp.split(params, 2, axis=1)
        std = jax.nn.softplus(scale) + 1e-4
        return OobleckPosterior(mean=mean, std=std)

    def decode(self, z: Array) -> Array:
        return self.decoder(z)


EntryClass = OobleckVAE
