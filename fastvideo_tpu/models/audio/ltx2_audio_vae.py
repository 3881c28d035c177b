"""LTX-2 audio VAE (mel-spectrogram autoencoder) + BigVGAN-style vocoder.

Behavioral reference: /root/reference/fastvideo/models/audio/
ltx2_audio_vae.py (:83-1530): causal 2D conv mel autoencoder (causality
along the TIME axis via one-sided padding; PixelNorm when causal),
per-channel latent statistics with dash-named buffers, vanilla conv
attention blocks, nearest-upsample with first-row crop; the vocoder is
HiFi-GAN/BigVGAN: transposed-conv upsampling, multi-kernel resblock
averaging, optional anti-aliased Snake activations (kaiser-sinc
up/downsampled), tanh output.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

Array = jax.Array

LATENT_DOWNSAMPLE_FACTOR = 4
LRELU_SLOPE = 0.1


def _conv2d(x: Array, w: Array, bias: Array | None, stride=(1, 1),
            dilation=(1, 1)) -> Array:
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding="VALID",
        rhs_dilation=dilation, dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if bias is not None:
        out = out + bias.astype(x.dtype)[None, :, None, None]
    return out


class PixelNorm(nnx.Module):
    """(reference :83-96)."""

    def __init__(self, dim: int = 1, eps: float = 1e-6):
        self.dim = dim
        self.eps = eps

    def __call__(self, x: Array) -> Array:
        ms = jnp.mean(jnp.square(x.astype(jnp.float32)), self.dim,
                      keepdims=True)
        return (x.astype(jnp.float32) / jnp.sqrt(ms + self.eps)).astype(
            x.dtype)


class AudioPerChannelStatistics(nnx.Module):
    """Dash-named stat buffers (reference :120-138); loader maps
    ``std-of-means``/``mean-of-means`` to underscores."""

    def __init__(self, latent_channels: int = 128, *, param_dtype=None,
                 rngs=None):
        del param_dtype, rngs
        self.std_of_means = nnx.Param(jnp.ones((latent_channels,),
                                               jnp.float32))
        self.mean_of_means = nnx.Param(jnp.zeros((latent_channels,),
                                                 jnp.float32))

    def un_normalize(self, x: Array) -> Array:
        return x * self.std_of_means.value.astype(x.dtype) + \
            self.mean_of_means.value.astype(x.dtype)

    def normalize(self, x: Array) -> Array:
        return (x - self.mean_of_means.value.astype(x.dtype)) / \
            self.std_of_means.value.astype(x.dtype)


class AudioCausalConv2d(nnx.Module):
    """Time-causal conv2d; padding per causality axis (reference
    :184-237). causality_axis: "none" | "height" | "width"."""

    def __init__(self, in_ch: int, out_ch: int, kernel_size, stride: int = 1,
                 dilation=1, causality_axis: str = "height", *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        ks = (kernel_size, kernel_size) if isinstance(kernel_size, int) \
            else tuple(kernel_size)
        dil = (dilation, dilation) if isinstance(dilation, int) \
            else tuple(dilation)
        init = nnx.initializers.lecun_normal()
        self.weight = nnx.Param(
            init(rngs.params(), (out_ch, in_ch, *ks), param_dtype))
        self.bias = nnx.Param(jnp.zeros((out_ch,), param_dtype))
        pad_h = (ks[0] - 1) * dil[0]
        pad_w = (ks[1] - 1) * dil[1]
        if causality_axis == "none":
            self.padding = (pad_w // 2, pad_w - pad_w // 2, pad_h // 2,
                            pad_h - pad_h // 2)
        elif causality_axis == "width":
            self.padding = (pad_w, 0, pad_h // 2, pad_h - pad_h // 2)
        elif causality_axis == "height":
            self.padding = (pad_w // 2, pad_w - pad_w // 2, pad_h, 0)
        else:
            raise ValueError(causality_axis)
        self.stride = (stride, stride) if isinstance(stride, int) else stride
        self.dilation = dil

    def __call__(self, x: Array) -> Array:
        left, right, top, bottom = self.padding
        x = jnp.pad(x, ((0, 0), (0, 0), (top, bottom), (left, right)))
        return _conv2d(x, self.weight.value, self.bias.value,
                       stride=self.stride, dilation=self.dilation)


class AudioAttnBlock(nnx.Module):
    """Vanilla conv attention (reference :276-317)."""

    def __init__(self, in_channels: int, *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm = PixelNorm()
        self.q = AudioCausalConv2d(in_channels, in_channels, 1,
                                   causality_axis="none", **kw)
        self.k = AudioCausalConv2d(in_channels, in_channels, 1,
                                   causality_axis="none", **kw)
        self.v = AudioCausalConv2d(in_channels, in_channels, 1,
                                   causality_axis="none", **kw)
        self.proj_out = AudioCausalConv2d(in_channels, in_channels, 1,
                                          causality_axis="none", **kw)

    def __call__(self, x: Array) -> Array:
        h = self.norm(x)
        q, k, v = self.q(h), self.k(h), self.v(h)
        b, c, hh, ww = q.shape
        q = q.reshape(b, c, hh * ww).transpose(0, 2, 1)
        k = k.reshape(b, c, hh * ww)
        w = jax.nn.softmax(
            jnp.einsum("bqc,bck->bqk", q, k) * (c**-0.5), axis=2)
        v = v.reshape(b, c, hh * ww)
        out = jnp.einsum("bck,bqk->bcq", v, w).reshape(b, c, hh, ww)
        return x + self.proj_out(out)


class AudioResnetBlock(nnx.Module):
    """(reference :341-409); PixelNorm for the causal path."""

    def __init__(self, in_channels: int, out_channels: int | None = None,
                 causality_axis: str = "height", *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        out_channels = out_channels or in_channels
        self.norm1 = PixelNorm()
        self.conv1 = AudioCausalConv2d(in_channels, out_channels, 3,
                                       causality_axis=causality_axis, **kw)
        self.norm2 = PixelNorm()
        self.conv2 = AudioCausalConv2d(out_channels, out_channels, 3,
                                       causality_axis=causality_axis, **kw)
        self.nin_shortcut = (AudioCausalConv2d(
            in_channels, out_channels, 1, causality_axis=causality_axis,
            **kw) if in_channels != out_channels else None)

    def __call__(self, x: Array) -> Array:
        h = self.conv1(jax.nn.silu(self.norm1(x)))
        h = self.conv2(jax.nn.silu(self.norm2(h)))
        if self.nin_shortcut is not None:
            x = self.nin_shortcut(x)
        return x + h


class AudioDownsample(nnx.Module):
    """Strided conv with causal padding (reference :805-843)."""

    def __init__(self, in_channels: int, causality_axis: str = "width", *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.weight = nnx.Param(
            init(rngs.params(), (in_channels, in_channels, 3, 3),
                 param_dtype))
        self.bias = nnx.Param(jnp.zeros((in_channels,), param_dtype))
        self.causality_axis = causality_axis

    def __call__(self, x: Array) -> Array:
        pad = {"none": (0, 1, 0, 1), "width": (2, 0, 0, 1),
               "height": (0, 1, 2, 0)}[self.causality_axis]
        left, right, top, bottom = pad
        x = jnp.pad(x, ((0, 0), (0, 0), (top, bottom), (left, right)))
        return _conv2d(x, self.weight.value, self.bias.value, stride=(2, 2))


class AudioUpsample(nnx.Module):
    """Nearest 2x upsample + causal conv + first-row crop
    (reference :904-937)."""

    def __init__(self, in_channels: int, causality_axis: str = "height", *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.conv = AudioCausalConv2d(in_channels, in_channels, 3,
                                      causality_axis=causality_axis,
                                      param_dtype=param_dtype, rngs=rngs)
        self.causality_axis = causality_axis

    def __call__(self, x: Array) -> Array:
        b, c, h, w = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        x = self.conv(x)
        if self.causality_axis == "height":
            x = x[:, :, 1:, :]
        elif self.causality_axis == "width":
            x = x[:, :, :, 1:]
        return x


class _MidBlock(nnx.Module):
    def __init__(self, channels: int, causality_axis: str,
                 add_attention: bool, *, param_dtype, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.block_1 = AudioResnetBlock(channels, channels, causality_axis,
                                        **kw)
        self.attn_1 = (AudioAttnBlock(channels, **kw)
                       if add_attention else None)
        self.block_2 = AudioResnetBlock(channels, channels, causality_axis,
                                        **kw)

    def __call__(self, x: Array) -> Array:
        x = self.block_1(x)
        if self.attn_1 is not None:
            x = self.attn_1(x)
        return self.block_2(x)


class _DownStage(nnx.Module):
    def __init__(self, blocks, attn, downsample):
        self.block = blocks
        self.attn = attn
        self.downsample = downsample


class _UpStage(nnx.Module):
    def __init__(self, blocks, attn, upsample):
        self.block = blocks
        self.attn = attn
        self.upsample = upsample


@dataclasses.dataclass
class LTX2AudioVAEArchConfig:
    ch: int = 128
    ch_mult: tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: tuple[int, ...] = ()
    in_channels: int = 2
    out_ch: int = 2
    resolution: int = 256
    z_channels: int = 8
    double_z: bool = True
    mid_block_add_attention: bool = True
    causality_axis: str = "height"
    sample_rate: int = 16000
    mel_hop_length: int = 160
    n_fft: int = 1024
    mel_bins: int = 64


class AudioEncoder(nnx.Module):
    """(reference :1043-1193)."""

    def __init__(self, config: LTX2AudioVAEArchConfig | None = None, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        cfg = config or LTX2AudioVAEArchConfig()
        self.config = cfg
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        ca = cfg.causality_axis
        self.per_channel_statistics = AudioPerChannelStatistics(cfg.ch)
        self.conv_in = AudioCausalConv2d(cfg.in_channels, cfg.ch, 3,
                                         causality_axis=ca, **kw)
        num_res = len(cfg.ch_mult)
        in_mult = (1, *cfg.ch_mult)
        curr_res = cfg.resolution
        downs = []
        block_in = cfg.ch
        for i in range(num_res):
            blocks, attns = [], []
            block_in = cfg.ch * in_mult[i]
            block_out = cfg.ch * cfg.ch_mult[i]
            for _ in range(cfg.num_res_blocks):
                blocks.append(AudioResnetBlock(block_in, block_out, ca,
                                               **kw))
                block_in = block_out
                if curr_res in cfg.attn_resolutions:
                    attns.append(AudioAttnBlock(block_in, **kw))
            down = _DownStage(
                nnx.List(blocks), nnx.List(attns),
                AudioDownsample(block_in, ca, **kw)
                if i != num_res - 1 else None)
            if i != num_res - 1:
                curr_res //= 2
            downs.append(down)
        self.down = nnx.List(downs)
        self.mid = _MidBlock(block_in, ca, cfg.mid_block_add_attention,
                             **kw)
        self.norm_out = PixelNorm()
        self.conv_out = AudioCausalConv2d(
            block_in, 2 * cfg.z_channels if cfg.double_z else cfg.z_channels,
            3, causality_axis=ca, **kw)

    def __call__(self, spectrogram: Array) -> Array:
        cfg = self.config
        h = self.conv_in(spectrogram)
        for i, stage in enumerate(self.down):
            for j, block in enumerate(stage.block):
                h = block(h)
                if len(stage.attn):
                    h = stage.attn[j](h)
            if stage.downsample is not None:
                h = stage.downsample(h)
        h = self.mid(h)
        h = self.conv_out(jax.nn.silu(self.norm_out(h)))
        # normalize the mean half with per-channel stats (reference
        # :1182-1193); stats are per (C*F) patch feature
        means = jnp.split(h, 2, axis=1)[0]
        b, c, t, f = means.shape
        patched = means.transpose(0, 2, 1, 3).reshape(b, t, c * f)
        normed = self.per_channel_statistics.normalize(patched)
        return normed.reshape(b, t, c, f).transpose(0, 2, 1, 3)


class AudioDecoder(nnx.Module):
    """(reference :1201-1399)."""

    def __init__(self, config: LTX2AudioVAEArchConfig | None = None, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        cfg = config or LTX2AudioVAEArchConfig()
        self.config = cfg
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        ca = cfg.causality_axis
        self.per_channel_statistics = AudioPerChannelStatistics(cfg.ch)
        num_res = len(cfg.ch_mult)
        base_ch = cfg.ch * cfg.ch_mult[-1]
        self.conv_in = AudioCausalConv2d(cfg.z_channels, base_ch, 3,
                                         causality_axis=ca, **kw)
        self.mid = _MidBlock(base_ch, ca, cfg.mid_block_add_attention, **kw)
        ups = [None] * num_res
        block_in = base_ch
        curr_res = cfg.resolution // (2**(num_res - 1))
        for level in reversed(range(num_res)):
            blocks, attns = [], []
            block_out = cfg.ch * cfg.ch_mult[level]
            for _ in range(cfg.num_res_blocks + 1):
                blocks.append(AudioResnetBlock(block_in, block_out, ca,
                                               **kw))
                block_in = block_out
                if curr_res in cfg.attn_resolutions:
                    attns.append(AudioAttnBlock(block_in, **kw))
            up = _UpStage(nnx.List(blocks), nnx.List(attns),
                          AudioUpsample(block_in, ca, **kw)
                          if level != 0 else None)
            if level != 0:
                curr_res *= 2
            ups[level] = up
        self.up = nnx.List(ups)
        self.norm_out = PixelNorm()
        self.conv_out = AudioCausalConv2d(block_in, cfg.out_ch, 3,
                                          causality_axis=ca, **kw)

    def __call__(self, sample: Array) -> Array:
        cfg = self.config
        b, c, t, f = sample.shape
        patched = sample.transpose(0, 2, 1, 3).reshape(b, t, c * f)
        denorm = self.per_channel_statistics.un_normalize(patched)
        sample = denorm.reshape(b, t, c, f).transpose(0, 2, 1, 3)

        target_frames = t * LATENT_DOWNSAMPLE_FACTOR
        if cfg.causality_axis != "none":
            target_frames = max(target_frames -
                                (LATENT_DOWNSAMPLE_FACTOR - 1), 1)
        target_mel = cfg.mel_bins

        h = self.conv_in(sample)
        h = self.mid(h)
        for level in reversed(range(len(cfg.ch_mult))):
            stage = self.up[level]
            for j, block in enumerate(stage.block):
                h = block(h)
                if len(stage.attn):
                    h = stage.attn[j](h)
            if stage.upsample is not None:
                h = stage.upsample(h)
        h = self.conv_out(jax.nn.silu(self.norm_out(h)))
        # crop/pad to target (reference :1344-1377)
        h = h[:, :cfg.out_ch, :min(h.shape[2], target_frames),
              :min(h.shape[3], target_mel)]
        pad_t = max(target_frames - h.shape[2], 0)
        pad_f = max(target_mel - h.shape[3], 0)
        if pad_t or pad_f:
            h = jnp.pad(h, ((0, 0), (0, 0), (0, pad_t), (0, pad_f)))
        return h[:, :cfg.out_ch, :target_frames, :target_mel]


# =============================================================================
# Vocoder
# =============================================================================


def _conv1d_same(x: Array, w: Array, bias: Array | None, dilation: int = 1,
                 groups: int = 1, stride: int = 1,
                 padding: int | None = None) -> Array:
    k = w.shape[-1]
    if padding is None:  # torch padding="same" (stride 1)
        total = dilation * (k - 1)
        pad = (total // 2, total - total // 2)
    else:
        pad = (padding, padding)
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride,), padding=[pad],
        rhs_dilation=(dilation,), feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"))
    if bias is not None:
        out = out + bias.astype(x.dtype)[None, :, None]
    return out


class VConv1d(nnx.Module):
    def __init__(self, in_ch: int, out_ch: int, kernel_size: int,
                 stride: int = 1, dilation: int = 1,
                 padding: int | str = "same", bias: bool = True, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.weight = nnx.Param(
            init(rngs.params(), (out_ch, in_ch, kernel_size), param_dtype))
        self.bias = nnx.Param(jnp.zeros((out_ch,), param_dtype)) \
            if bias else None
        self.stride = stride
        self.dilation = dilation
        self.padding = padding

    def __call__(self, x: Array) -> Array:
        pad = None if self.padding == "same" else self.padding
        return _conv1d_same(x, self.weight.value,
                            None if self.bias is None else self.bias.value,
                            dilation=self.dilation, stride=self.stride,
                            padding=pad)


class VConvTranspose1d(nnx.Module):
    """torch ConvTranspose1d with padding=(k-stride)//2."""

    def __init__(self, in_ch: int, out_ch: int, kernel_size: int,
                 stride: int, *, param_dtype=jnp.float32, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.weight = nnx.Param(
            init(rngs.params(), (in_ch, out_ch, kernel_size), param_dtype))
        self.bias = nnx.Param(jnp.zeros((out_ch,), param_dtype))
        self.stride = stride
        self.kernel_size = kernel_size
        self.pad = (kernel_size - stride) // 2

    def __call__(self, x: Array) -> Array:
        w = jnp.flip(self.weight.value, -1).transpose(1, 0, 2)
        pad = self.kernel_size - 1 - self.pad
        out = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(1,), padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NCH", "OIH", "NCH"))
        return out + self.bias.value.astype(x.dtype)[None, :, None]


def kaiser_sinc_filter1d(cutoff: float, half_width: float,
                         kernel_size: int) -> np.ndarray:
    """(reference :494-520)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    amplitude = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if amplitude > 50.0:
        beta = 0.1102 * (amplitude - 8.7)
    elif amplitude >= 21.0:
        beta = 0.5842 * (amplitude - 21)**0.4 + 0.07886 * (amplitude - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    time = (np.arange(-half_size, half_size) + 0.5 if even else
            np.arange(kernel_size) - half_size)
    if cutoff == 0:
        filt = np.zeros_like(time, dtype=np.float64)
    else:
        filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
        filt = filt / filt.sum()
    return filt.reshape(1, 1, kernel_size).astype(np.float32)


class UpSample1d(nnx.Module):
    """Anti-aliased sinc upsample (reference :558-616)."""

    def __init__(self, ratio: int = 2, kernel_size: int | None = None):
        self.ratio = ratio
        self.kernel_size = (int(6 * ratio // 2) * 2
                            if kernel_size is None else kernel_size)
        self.pad = self.kernel_size // ratio - 1
        self.pad_left = self.pad * ratio + (self.kernel_size - ratio) // 2
        self.pad_right = self.pad * ratio + \
            (self.kernel_size - ratio + 1) // 2
        self.filter = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio,
                                           self.kernel_size)

    def __call__(self, x: Array) -> Array:
        n_ch = x.shape[1]
        x = jnp.pad(x, ((0, 0), (0, 0), (self.pad, self.pad)), mode="edge")
        filt = jnp.asarray(self.filter)
        w = jnp.broadcast_to(filt, (n_ch, 1, self.kernel_size))
        # grouped transposed conv == lhs-dilated conv w/ flipped kernel
        w_conv = jnp.flip(w, -1)
        pad = self.kernel_size - 1
        out = self.ratio * jax.lax.conv_general_dilated(
            x, w_conv.astype(x.dtype), window_strides=(1,),
            padding=[(pad, pad)], lhs_dilation=(self.ratio,),
            feature_group_count=n_ch,
            dimension_numbers=("NCH", "OIH", "NCH"))
        return out[..., self.pad_left:-self.pad_right]


class DownSample1d(nnx.Module):
    """(reference :619-634 + LowPassFilter1d :523-555)."""

    def __init__(self, ratio: int = 2, kernel_size: int | None = None):
        self.ratio = ratio
        self.kernel_size = (int(6 * ratio // 2) * 2
                            if kernel_size is None else kernel_size)
        even = self.kernel_size % 2 == 0
        self.pad_left = self.kernel_size // 2 - int(even)
        self.pad_right = self.kernel_size // 2
        self.filter = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio,
                                           self.kernel_size)

    def __call__(self, x: Array) -> Array:
        n_ch = x.shape[1]
        x = jnp.pad(x, ((0, 0), (0, 0), (self.pad_left, self.pad_right)),
                    mode="edge")
        w = jnp.broadcast_to(jnp.asarray(self.filter),
                             (n_ch, 1, self.kernel_size))
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(self.ratio,),
            padding="VALID", feature_group_count=n_ch,
            dimension_numbers=("NCH", "OIH", "NCH"))


class Snake(nnx.Module):
    def __init__(self, in_features: int, logscale: bool = True, *,
                 param_dtype=jnp.float32, rngs=None):
        del rngs
        self.alpha = nnx.Param(jnp.zeros((in_features,), param_dtype)
                               if logscale else
                               jnp.ones((in_features,), param_dtype))
        self.logscale = logscale

    def __call__(self, x: Array) -> Array:
        alpha = self.alpha.value.astype(x.dtype)[None, :, None]
        if self.logscale:
            alpha = jnp.exp(alpha)
        return x + (1.0 / (alpha + 1e-9)) * jnp.square(jnp.sin(x * alpha))


class SnakeBeta(nnx.Module):
    def __init__(self, in_features: int, logscale: bool = True, *,
                 param_dtype=jnp.float32, rngs=None):
        del rngs
        init = jnp.zeros if logscale else jnp.ones
        self.alpha = nnx.Param(init((in_features,), param_dtype))
        self.beta = nnx.Param(init((in_features,), param_dtype))
        self.logscale = logscale

    def __call__(self, x: Array) -> Array:
        alpha = self.alpha.value.astype(x.dtype)[None, :, None]
        beta = self.beta.value.astype(x.dtype)[None, :, None]
        if self.logscale:
            alpha = jnp.exp(alpha)
            beta = jnp.exp(beta)
        return x + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(x * alpha))


class Activation1d(nnx.Module):
    """Anti-aliased activation (reference :637-654)."""

    def __init__(self, activation, up_ratio: int = 2, down_ratio: int = 2,
                 up_kernel_size: int = 12, down_kernel_size: int = 12):
        self.act = activation
        self.upsample = UpSample1d(up_ratio, up_kernel_size)
        self.downsample = DownSample1d(down_ratio, down_kernel_size)

    def __call__(self, x: Array) -> Array:
        return self.downsample(self.act(self.upsample(x)))


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return int((kernel_size * dilation - dilation) / 2)


class VocResBlock1(nnx.Module):
    """(reference :417-449)."""

    def __init__(self, channels: int, kernel_size: int = 3,
                 dilation=(1, 3, 5), *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.convs1 = nnx.List([
            VConv1d(channels, channels, kernel_size, dilation=d, **kw)
            for d in dilation
        ])
        self.convs2 = nnx.List([
            VConv1d(channels, channels, kernel_size, dilation=1, **kw)
            for _ in dilation
        ])

    def __call__(self, x: Array) -> Array:
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = c1(jax.nn.leaky_relu(x, LRELU_SLOPE))
            xt = c2(jax.nn.leaky_relu(xt, LRELU_SLOPE))
            x = x + xt
        return x


class VocResBlock2(nnx.Module):
    """(reference :452-474)."""

    def __init__(self, channels: int, kernel_size: int = 3, dilation=(1, 3),
                 *, param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.convs = nnx.List([
            VConv1d(channels, channels, kernel_size, dilation=d, **kw)
            for d in dilation
        ])

    def __call__(self, x: Array) -> Array:
        for c in self.convs:
            x = x + c(jax.nn.leaky_relu(x, LRELU_SLOPE))
        return x


class AMPBlock1(nnx.Module):
    """(reference :715-797)."""

    def __init__(self, channels: int, kernel_size: int = 3,
                 dilation=(1, 3, 5), activation: str = "snake", *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        act_cls = SnakeBeta if activation == "snakebeta" else Snake
        self.convs1 = nnx.List([
            VConv1d(channels, channels, kernel_size, dilation=d,
                    padding=get_padding(kernel_size, d), **kw)
            for d in dilation
        ])
        self.convs2 = nnx.List([
            VConv1d(channels, channels, kernel_size, dilation=1,
                    padding=get_padding(kernel_size, 1), **kw)
            for _ in dilation
        ])
        self.acts1 = nnx.List(
            [Activation1d(act_cls(channels, **kw)) for _ in dilation])
        self.acts2 = nnx.List(
            [Activation1d(act_cls(channels, **kw)) for _ in dilation])

    def __call__(self, x: Array) -> Array:
        for c1, c2, a1, a2 in zip(self.convs1, self.convs2, self.acts1,
                                  self.acts2):
            xt = c2(a2(c1(a1(x))))
            x = x + xt
        return x


@dataclasses.dataclass
class VocoderArchConfig:
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    upsample_rates: tuple[int, ...] = (6, 5, 2, 2, 2)
    upsample_kernel_sizes: tuple[int, ...] = (16, 15, 8, 4, 4)
    resblock_dilation_sizes: tuple[tuple[int, ...], ...] = ((1, 3, 5),) * 3
    upsample_initial_channel: int = 1024
    stereo: bool = True
    resblock: str = "1"
    output_sample_rate: int = 24000
    activation: str = "snake"
    use_tanh_at_final: bool = True
    apply_final_activation: bool = True
    use_bias_at_final: bool = True


class Vocoder(nnx.Module):
    """(reference :1407-1529)."""

    def __init__(self, config: VocoderArchConfig | None = None, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        cfg = config or VocoderArchConfig()
        self.config = cfg
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.num_kernels = len(cfg.resblock_kernel_sizes)
        self.num_upsamples = len(cfg.upsample_rates)
        self.is_amp = cfg.resblock == "AMP1"
        in_channels = 128 if cfg.stereo else 64
        uic = cfg.upsample_initial_channel
        self.conv_pre = VConv1d(in_channels, uic, 7, padding=3, **kw)
        self.ups = nnx.List([
            VConvTranspose1d(uic // (2**i), uic // (2**(i + 1)), k, s, **kw)
            for i, (s, k) in enumerate(
                zip(cfg.upsample_rates, cfg.upsample_kernel_sizes))
        ])
        resblocks = []
        for i in range(self.num_upsamples):
            ch = uic // (2**(i + 1))
            for k, d in zip(cfg.resblock_kernel_sizes,
                            cfg.resblock_dilation_sizes):
                if self.is_amp:
                    resblocks.append(
                        AMPBlock1(ch, k, tuple(d),
                                  activation=cfg.activation, **kw))
                elif cfg.resblock == "1":
                    resblocks.append(VocResBlock1(ch, k, tuple(d), **kw))
                else:
                    resblocks.append(VocResBlock2(ch, k, tuple(d), **kw))
        self.resblocks = nnx.List(resblocks)
        out_channels = 2 if cfg.stereo else 1
        final_ch = uic // (2**self.num_upsamples)
        self.act_post = (Activation1d(SnakeBeta(final_ch, **kw))
                         if self.is_amp else None)
        self.conv_post = VConv1d(final_ch, out_channels, 7, padding=3,
                                 bias=cfg.use_bias_at_final, **kw)
        self.upsample_factor = math.prod(cfg.upsample_rates)

    def __call__(self, x: Array) -> Array:
        """x [B, C, T, mel] -> waveform [B, out_ch, samples]."""
        cfg = self.config
        x = jnp.swapaxes(x, 2, 3)  # -> [B, C, mel, T]
        if x.ndim == 4:
            b, s, c, t = x.shape
            x = x.reshape(b, s * c, t)
        x = self.conv_pre(x)
        for i in range(self.num_upsamples):
            if not self.is_amp:
                x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            x = self.ups[i](x)
            start = i * self.num_kernels
            outs = [self.resblocks[j](x)
                    for j in range(start, start + self.num_kernels)]
            x = jnp.mean(jnp.stack(outs, 0), axis=0)
        if self.act_post is not None:
            x = self.act_post(x)
        else:
            x = jax.nn.leaky_relu(x, 0.01)
        x = self.conv_post(x)
        if cfg.apply_final_activation:
            x = jnp.tanh(x) if cfg.use_tanh_at_final else jnp.clip(
                x, -1, 1)
        return x


EntryClass = (AudioEncoder, AudioDecoder, Vocoder)


LTX2_AUDIO_PARAM_NAMES_MAPPING: dict = {
    # CausalConv2d / Downsample wrap a plain torch conv as ".conv"
    r"^(.*)\.conv\.(weight|bias)$": r"\1.\2",
    # dash-named statistics buffers
    r"^(.*)\.std-of-means$": r"\1.std_of_means",
    r"^(.*)\.mean-of-means$": r"\1.mean_of_means",
}
