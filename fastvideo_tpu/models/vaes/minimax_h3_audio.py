"""MiniMax-H3 waveform autoencoder (DAC encoder + BigVGAN decoder).

Behavioral reference: /root/reference/fastvideo/models/vaes/minimax_h3_audio.py
(:92-525): weight-normed DAC-style encoder over mono 32 kHz waveforms, a
causal-attention projection from the trunk width to the latent width (with
head-mean + adaptive average pooling — an unusual flat-stream reduction,
reference :266-301), mean/log-std heads, and an anti-aliased BigVGAN
decoder with SnakeBeta activations. The whole component stays fp32
(reference :462-463).

Reuses the shared audio blocks: weight-norm convs from the Oobleck VAE and
the kaiser-sinc anti-aliased activation stack from the LTX-2 vocoder.
Layout is NCL throughout (1D audio is tiny next to video — no TPU-specific
re-layout needed; the convs lower to XLA's NCH 1D path).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.configs.models.base import ArchConfig
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.layers.norm import FP32LayerNorm
from fastvideo_tpu.models.audio.ltx2_audio_vae import (Activation1d,
                                                      SnakeBeta, VConv1d)
from fastvideo_tpu.models.vaes.oobleck import WNConv1d, WNConvTranspose1d

Array = jax.Array


@dataclasses.dataclass
class MiniMaxH3AudioVAEArchConfig(ArchConfig):
    """Reference: configs/models/vaes/minimax_h3_audio.py."""

    encoder_dim: int = 64
    encoder_rates: tuple[int, ...] = (2, 4, 4, 5, 5)
    latent_dim: int = 2048
    latent_channels: int = 32
    num_attention_heads: int = 8

    decoder_dim: int = 1024
    decoder_rates: tuple[int, ...] = (5, 5, 2, 2, 2, 2, 2)
    decoder_kernel_sizes: tuple[int, ...] = (9, 9, 4, 4, 4, 4, 4)
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: tuple[tuple[int, ...], ...] = ((1, 3, 5),) * 3

    sampling_rate: int = 32000
    latents_mean: tuple[float, ...] | None = None
    latents_std: tuple[float, ...] | None = None
    scaling_factor: float = 1.0


class MMAudioGaussian:
    """Posterior parameterized by mean and LOG-STD (reference :23-44)."""

    def __init__(self, mean: Array, logs: Array):
        self.mean = mean
        self.logs = logs
        self.std = jnp.exp(logs)

    def mode(self) -> Array:
        return self.mean

    def sample(self, key: jax.Array) -> Array:
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, self.mean.dtype)


class MMAudioSnake1d(nnx.Module):
    """x + sin^2(alpha x)/alpha, alpha init ones (reference :92-99)."""

    def __init__(self, channels: int, *, param_dtype=jnp.float32,
                 rngs=None):
        del rngs
        self.alpha = nnx.Param(jnp.ones((1, channels, 1), param_dtype))

    def __call__(self, x: Array) -> Array:
        alpha = self.alpha.value.astype(x.dtype)
        return x + jnp.square(jnp.sin(alpha * x)) / (alpha + 1e-9)


class MMAudioResidualUnit(nnx.Module):
    """Snake-conv-Snake-conv with centered residual trim
    (reference :191-207). Sequential indices mirror the torch keys."""

    def __init__(self, dim: int, dilation: int, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.block = nnx.List([
            MMAudioSnake1d(dim, **kw),
            WNConv1d(dim, dim, 7, dilation=dilation,
                     padding=((7 - 1) * dilation) // 2, **kw),
            MMAudioSnake1d(dim, **kw),
            WNConv1d(dim, dim, 1, **kw),
        ])

    def __call__(self, x: Array) -> Array:
        out = x
        for mod in self.block:
            out = mod(out)
        pad = (x.shape[-1] - out.shape[-1]) // 2
        if pad > 0:
            x = x[..., pad:-pad]
        return x + out


class MMAudioEncoderBlock(nnx.Module):
    """Reference :210-229."""

    def __init__(self, dim: int, stride: int, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.block = nnx.List([
            MMAudioResidualUnit(dim // 2, 1, **kw),
            MMAudioResidualUnit(dim // 2, 3, **kw),
            MMAudioResidualUnit(dim // 2, 9, **kw),
            MMAudioSnake1d(dim // 2, **kw),
            WNConv1d(dim // 2, dim, 2 * stride, stride=stride,
                     padding=math.ceil(stride / 2), **kw),
        ])

    def __call__(self, x: Array) -> Array:
        for mod in self.block:
            x = mod(x)
        return x


class MMAudioEncoder(nnx.Module):
    """Reference :232-247."""

    def __init__(self, d_model: int, strides: tuple[int, ...],
                 d_latent: int, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        mods: list[nnx.Module] = [WNConv1d(1, d_model, 7, padding=3, **kw)]
        for stride in strides:
            d_model *= 2
            mods.append(MMAudioEncoderBlock(d_model, stride, **kw))
        mods += [
            MMAudioSnake1d(d_model, **kw),
            WNConv1d(d_model, d_latent, 3, padding=1, **kw),
        ]
        self.block = nnx.List(mods)

    def __call__(self, x: Array) -> Array:
        for mod in self.block:
            x = mod(x)
        return x


def _adaptive_avg_pool_last(x: Array, out_size: int) -> Array:
    """torch adaptive_avg_pool1d over the last axis (static windows)."""
    length = x.shape[-1]
    if length % out_size == 0:
        k = length // out_size
        return x.reshape(*x.shape[:-1], out_size, k).mean(-1)
    cols = []
    for i in range(out_size):
        lo = (i * length) // out_size
        hi = -(-((i + 1) * length) // out_size)  # ceil
        cols.append(x[..., lo:hi].mean(-1))
    return jnp.stack(cols, axis=-1)


class MMAudioGeGluMlp(nnx.Module):
    """Reference :250-263."""

    def __init__(self, in_features: int, hidden_features: int, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm = FP32LayerNorm(in_features, eps=1e-5, **kw)
        self.w0 = Linear(in_features, hidden_features, **kw)
        self.w1 = Linear(in_features, hidden_features, **kw)
        self.w2 = Linear(hidden_features, in_features, **kw)

    def __call__(self, x: Array) -> Array:
        x = self.norm(x)
        return self.w2(jax.nn.gelu(self.w0(x), approximate=True) *
                       self.w1(x))


class MMAudioCausalAttention(nnx.Module):
    """Causal flat-stream projection trunk->latent width
    (reference :266-301): causal SDPA, then mean over heads, then adaptive
    average pooling of the head dim down to ``out_dim``."""

    def __init__(self, in_dim: int, out_dim: int, num_heads: int, *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.out_dim = out_dim
        self.num_heads = num_heads
        self.head_dim = in_dim // num_heads
        self.qkv = Linear(in_dim, in_dim * 3, bias=False, **kw)
        self.q_bias = nnx.Param(jnp.zeros((in_dim,), param_dtype))
        self.v_bias = nnx.Param(jnp.zeros((in_dim,), param_dtype))
        # persistent zero buffer in the reference checkpoint
        self.zero_k_bias = nnx.Param(jnp.zeros((in_dim,), param_dtype))
        self.proj = Linear(out_dim, out_dim, **kw)

    def __call__(self, x: Array) -> Array:  # [B, S, in_dim]
        b, s, d = x.shape
        bias = jnp.concatenate([
            self.q_bias.value, self.zero_k_bias.value, self.v_bias.value
        ]).astype(x.dtype)
        qkv = self.qkv(x) + bias
        q, k, v = jnp.split(
            qkv.reshape(b, s, 3, self.num_heads, self.head_dim), 3, axis=2)
        q, k, v = (t[:, :, 0].transpose(0, 2, 1, 3) for t in (q, k, v))
        scale = 1.0 / math.sqrt(self.head_dim)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        mask = jnp.tril(jnp.ones((s, s), bool))
        scores = jnp.where(mask, scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3)
        out = out.mean(axis=2)  # mean over heads -> [B, S, head_dim]
        out = _adaptive_avg_pool_last(out, self.out_dim)
        return self.proj(out)


class MMAudioAttnProjection(nnx.Module):
    """Reference :304-317."""

    def __init__(self, in_dim: int, out_dim: int, num_heads: int,
                 mlp_ratio: int = 2, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm1 = FP32LayerNorm(in_dim, eps=1e-5, **kw)
        self.attn = MMAudioCausalAttention(in_dim, out_dim, num_heads, **kw)
        self.proj = Linear(in_dim, out_dim, **kw)
        self.norm3 = FP32LayerNorm(in_dim, eps=1e-5, **kw)
        self.norm2 = FP32LayerNorm(out_dim, eps=1e-5, **kw)
        self.mlp = MMAudioGeGluMlp(out_dim, out_dim * mlp_ratio, **kw)

    def __call__(self, x: Array) -> Array:
        x = self.proj(self.norm3(x)) + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class MMAudioAMPBlock(nnx.Module):
    """Anti-aliased BigVGAN residual block; ``activations`` interleaves
    (act1, act2) pairs exactly like the torch ModuleList
    (reference :320-343)."""

    def __init__(self, channels: int, kernel_size: int,
                 dilation: tuple[int, ...], *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.convs1 = nnx.List([
            WNConv1d(channels, channels, kernel_size, dilation=d,
                     padding=(kernel_size * d - d) // 2, **kw)
            for d in dilation
        ])
        self.convs2 = nnx.List([
            WNConv1d(channels, channels, kernel_size, dilation=1,
                     padding=(kernel_size - 1) // 2, **kw)
            for _ in dilation
        ])
        self.activations = nnx.List([
            Activation1d(SnakeBeta(channels, **kw))
            for _ in range(2 * len(dilation))
        ])

    def __call__(self, x: Array) -> Array:
        acts1 = [self.activations[i] for i in range(0,
                                                    len(self.activations),
                                                    2)]
        acts2 = [self.activations[i] for i in range(1,
                                                    len(self.activations),
                                                    2)]
        for c1, c2, a1, a2 in zip(self.convs1, self.convs2, acts1, acts2):
            r = c2(a2(c1(a1(x))))
            x = r + x
        return x


class MMAudioBigVGANDecoder(nnx.Module):
    """Reference :346-395."""

    def __init__(self, in_channels: int, upsample_initial_channel: int,
                 upsample_rates: tuple[int, ...],
                 upsample_kernel_sizes: tuple[int, ...],
                 resblock_kernel_sizes: tuple[int, ...],
                 resblock_dilation_sizes: tuple[tuple[int, ...], ...], *,
                 param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.num_kernels = len(resblock_kernel_sizes)
        self.num_upsamples = len(upsample_rates)
        uic = upsample_initial_channel
        self.conv_pre = WNConv1d(in_channels, uic, 7, padding=3, **kw)
        self.ups = nnx.List([
            nnx.List([
                WNConvTranspose1d(uic // (2**i), uic // (2**(i + 1)),
                                  kernel, stride=rate,
                                  padding=(kernel - rate) // 2, **kw)
            ]) for i, (rate, kernel) in enumerate(
                zip(upsample_rates, upsample_kernel_sizes))
        ])
        blocks = []
        for i in range(self.num_upsamples):
            channels = uic // (2**(i + 1))
            for kernel, dil in zip(resblock_kernel_sizes,
                                   resblock_dilation_sizes):
                blocks.append(
                    MMAudioAMPBlock(channels, kernel, tuple(dil), **kw))
        self.resblocks = nnx.List(blocks)
        self.activation_post = Activation1d(SnakeBeta(channels, **kw))
        self.conv_post = WNConv1d(channels, 1, 7, padding=3, bias=False,
                                  **kw)

    def __call__(self, x: Array) -> Array:
        x = self.conv_pre(x)
        for i in range(self.num_upsamples):
            x = self.ups[i][0](x)
            residual = None
            for j in range(self.num_kernels):
                block = self.resblocks[i * self.num_kernels + j](x)
                residual = block if residual is None else residual + block
            x = residual / self.num_kernels
        x = self.conv_post(self.activation_post(x))
        return jnp.clip(x, -1.0, 1.0)


class MiniMaxH3AudioVAE(nnx.Module):
    """Reference :398-525. Stays fp32 (checkpoint numerics)."""

    def __init__(self, config: MiniMaxH3AudioVAEArchConfig,
                 load_encoder: bool = True, load_decoder: bool = True, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        param_dtype = jnp.float32  # reference pins fp32 (:462-463)
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        arch = config
        self.config = config
        enc_rates = tuple(int(r) for r in arch.encoder_rates)
        dec_rates = tuple(int(r) for r in arch.decoder_rates)
        self.hop_length = math.prod(enc_rates)
        self.sampling_rate = int(arch.sampling_rate)
        self.latent_channels = int(arch.latent_channels)
        self.audio_channels = 1
        if math.prod(dec_rates) != self.hop_length:
            raise ValueError("decoder_rates must upsample by the encoder "
                             f"hop length {self.hop_length}")
        if arch.latent_dim % arch.latent_channels != 0:
            raise ValueError("latent_dim must be a multiple of "
                             "latent_channels")
        mean = arch.latents_mean or [0.0] * self.latent_channels
        std = arch.latents_std or [1.0] * self.latent_channels
        self._latents_mean = np.asarray(mean, np.float32).reshape(1, -1, 1)
        self._latents_std = np.asarray(std, np.float32).reshape(1, -1, 1)

        if load_encoder:
            self.encoder = MMAudioEncoder(arch.encoder_dim, enc_rates,
                                          arch.latent_dim, **kw)
            self.pre_block = MMAudioAttnProjection(
                arch.latent_dim, arch.latent_channels,
                arch.num_attention_heads, **kw)
            self.mean_proj = VConv1d(arch.latent_channels,
                                     arch.latent_channels, 1, padding=0,
                                     **kw)
            self.logs_proj = VConv1d(arch.latent_channels,
                                     arch.latent_channels, 1, padding=0,
                                     **kw)
        else:
            self.encoder = None
            self.pre_block = None
            self.mean_proj = None
            self.logs_proj = None

        if load_decoder:
            self.dec_in_proj = VConv1d(arch.latent_channels,
                                       arch.latent_dim, 1, padding=0, **kw)
            self.decoder = MMAudioBigVGANDecoder(
                arch.latent_dim, arch.decoder_dim, dec_rates,
                tuple(int(k) for k in arch.decoder_kernel_sizes),
                tuple(int(k) for k in arch.resblock_kernel_sizes),
                tuple(tuple(int(d) for d in g)
                      for g in arch.resblock_dilation_sizes), **kw)
        else:
            self.dec_in_proj = None
            self.decoder = None

    def normalize_latents(self, latents: Array) -> Array:
        return (latents - self._latents_mean) / self._latents_std

    def denormalize_latents(self, latents: Array) -> Array:
        return latents * self._latents_std + self._latents_mean

    def encode(self, sample: Array) -> MMAudioGaussian:
        """sample [B, 1, num_samples] -> posterior over [B, zC, tokens]."""
        if sample.ndim != 3 or sample.shape[1] != 1:
            raise ValueError(
                f"sample must be [batch, 1, samples], got {sample.shape}")
        pad = (-sample.shape[-1]) % self.hop_length
        if pad > 0:
            sample = jnp.pad(sample, ((0, 0), (0, 0), (0, pad)))
        h = self.encoder(sample.astype(jnp.float32))
        h = self.pre_block(h.transpose(0, 2, 1)).transpose(0, 2, 1)
        return MMAudioGaussian(self.mean_proj(h), self.logs_proj(h))

    def decode(self, latents: Array, **kwargs) -> Array:
        """latents [B, zC, tokens] -> waveform [B, 1, samples] in
        [-1, 1]."""
        if latents.ndim != 3:
            raise ValueError(
                f"latents must be [batch, C, frames], got {latents.shape}")
        return self.decoder(self.dec_in_proj(latents.astype(jnp.float32)))


AutoencoderKLMiniMaxH3Audio = MiniMaxH3AudioVAE
EntryClass = MiniMaxH3AudioVAE
