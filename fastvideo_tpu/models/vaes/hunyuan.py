"""HunyuanVideo causal 3D VAE, TPU-native (channels-last).

Behavioral reference: /root/reference/fastvideo/models/vaes/hunyuanvae.py
(:44-840): replicate-padded causal convs, GroupNorm+SiLU resnets,
strided-conv downsample, first-frame-separate nearest upsample, global
spatio-temporal single-head mid attention with a block-causal temporal
mask. Full-clip single-program design like the Wan VAE.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.configs.models.base import ModelConfig, VAEArchConfig
from fastvideo_tpu.layers.linear import Linear
from fastvideo_tpu.models.vaes.wan import DiagonalGaussianDistribution

Array = jax.Array

HUNYUAN_VAE_PARAM_NAMES_MAPPING: dict[str, str] = {
    # down/up samplers wrap a causal conv that wraps nn.Conv3d: .conv.conv
    r"^(.*samplers\.\d+)\.conv\.conv\.(weight|bias)$": r"\1.\2",
    # every causal conv wraps nn.Conv3d in `.conv`
    r"^(.*)\.conv\.(weight|bias)$": r"\1.\2",
    # attention to_out is an nn.Sequential of one Linear
    r"^(.*)\.to_out\.0\.(weight|bias)$": r"\1.to_out.\2",
}


@dataclasses.dataclass
class HunyuanVAEArchConfig(VAEArchConfig):
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    act_fn: str = "silu"
    mid_block_add_attention: bool = True
    scaling_factor: float = 0.476986
    temporal_compression_ratio: int = 4
    spatial_compression_ratio: int = 8

    # Wan-config-compatible aliases used by LatentPreparationStage
    patch_size: int = 0

    @property
    def z_dim(self) -> int:
        return self.latent_channels

    @property
    def scale_factor_temporal(self) -> int:
        return self.temporal_compression_ratio

    @property
    def scale_factor_spatial(self) -> int:
        return self.spatial_compression_ratio


@dataclasses.dataclass
class HunyuanVAEConfig(ModelConfig):
    arch_config: HunyuanVAEArchConfig = dataclasses.field(
        default_factory=HunyuanVAEArchConfig)
    param_names_mapping: dict[str, str] = dataclasses.field(
        default_factory=lambda: dict(HUNYUAN_VAE_PARAM_NAMES_MAPPING))


class GroupNorm(nnx.Module):
    """GroupNorm over channels-last tensors (fp32 stats)."""

    def __init__(self, num_groups: int, num_channels: int,
                 eps: float = 1e-6, *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        del rngs
        self.num_groups = num_groups
        self.eps = eps
        self.weight = nnx.Param(jnp.ones((num_channels,), param_dtype))
        self.bias = nnx.Param(jnp.zeros((num_channels,), param_dtype))

    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        g = self.num_groups
        xf = x.astype(jnp.float32).reshape(*x.shape[:-1], g, c // g)
        axes = tuple(range(1, xf.ndim - 2)) + (xf.ndim - 1,)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        out = out.reshape(x.shape)
        out = out * self.weight.value.astype(jnp.float32) + \
            self.bias.value.astype(jnp.float32)
        return out.astype(x.dtype)


class HYCausalConv3d(nnx.Module):
    """Replicate-padded causal conv (hunyuanvae.py:116-157)."""

    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: int | tuple[int, int, int] = 3,
                 stride: int | tuple[int, int, int] = 1, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size,) * 3
        if isinstance(stride, int):
            stride = (stride,) * 3
        self.kernel_size = kernel_size
        self.stride = stride
        init = nnx.initializers.lecun_normal(in_axis=(0, 1, 2, 3), out_axis=4)
        self.weight = nnx.Param(
            init(rngs.params(), (*kernel_size, in_channels, out_channels),
                 param_dtype))
        self.bias = nnx.Param(jnp.zeros((out_channels,), param_dtype))

    def __call__(self, x: Array) -> Array:
        kt, kh, kw = self.kernel_size
        x = jnp.pad(x, ((0, 0), (kt - 1, 0), (kh // 2, kh // 2),
                        (kw // 2, kw // 2), (0, 0)), mode="edge")
        out = jax.lax.conv_general_dilated(
            x, self.weight.value.astype(x.dtype),
            window_strides=self.stride, padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return out + self.bias.value.astype(out.dtype)


class Conv1x1(nnx.Module):
    """nn.Conv3d kernel 1 (quant/post_quant convs)."""

    def __init__(self, in_channels: int, out_channels: int, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal(in_axis=(0, 1, 2, 3), out_axis=4)
        self.weight = nnx.Param(
            init(rngs.params(), (1, 1, 1, in_channels, out_channels),
                 param_dtype))
        self.bias = nnx.Param(jnp.zeros((out_channels,), param_dtype))

    def __call__(self, x: Array) -> Array:
        w = self.weight.value[0, 0, 0].astype(x.dtype)
        return jnp.dot(x, w) + self.bias.value.astype(x.dtype)


class HYResnetBlock(nnx.Module):
    def __init__(self, in_channels: int, out_channels: int | None = None,
                 groups: int = 32, *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        out_channels = out_channels or in_channels
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.norm1 = GroupNorm(groups, in_channels, **kw)
        self.conv1 = HYCausalConv3d(in_channels, out_channels, 3, 1, **kw)
        self.norm2 = GroupNorm(groups, out_channels, **kw)
        self.conv2 = HYCausalConv3d(out_channels, out_channels, 3, 1, **kw)
        self.conv_shortcut = (HYCausalConv3d(in_channels, out_channels, 1, 1,
                                             **kw)
                              if in_channels != out_channels else None)

    def __call__(self, x: Array) -> Array:
        residual = x
        x = self.conv1(jax.nn.silu(self.norm1(x)))
        x = self.conv2(jax.nn.silu(self.norm2(x)))
        if self.conv_shortcut is not None:
            residual = self.conv_shortcut(residual)
        return x + residual


class HYVAEAttention(nnx.Module):
    """Single-head global spatio-temporal attention (hunyuanvae.py:44-113)."""

    def __init__(self, channels: int, groups: int, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.group_norm = GroupNorm(groups, channels, **kw)
        self.to_q = Linear(channels, channels, **kw)
        self.to_k = Linear(channels, channels, **kw)
        self.to_v = Linear(channels, channels, **kw)
        self.to_out = Linear(channels, channels, **kw)
        self.channels = channels

    def __call__(self, x: Array) -> Array:
        """x: [B, T, H, W, C] -> block-causal-in-time global attention."""
        b, t, h, w, c = x.shape
        residual = x
        xs = self.group_norm(x).reshape(b, t * h * w, c)
        # single head; block-causal temporal mask
        # (reference prepare_causal_attention_mask, hunyuanvae.py:27-41)
        frame = jnp.arange(t * h * w) // (h * w)
        mask = (frame[None, :] <= frame[:, None])[None, None]
        out = jax.nn.dot_product_attention(
            self.to_q(xs)[:, :, None, :],
            self.to_k(xs)[:, :, None, :],
            self.to_v(xs)[:, :, None, :], mask=mask)
        out = self.to_out(out[:, :, 0])
        return out.reshape(b, t, h, w, c) + residual


class HYMidBlock(nnx.Module):
    def __init__(self, channels: int, groups: int, add_attention: bool, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.resnets = nnx.List([
            HYResnetBlock(channels, channels, groups, **kw),
            HYResnetBlock(channels, channels, groups, **kw),
        ])
        self.attentions = nnx.List(
            [HYVAEAttention(channels, groups, **kw)]
            if add_attention else [])

    def __call__(self, x: Array) -> Array:
        x = self.resnets[0](x)
        for i, resnet in enumerate(self.resnets[1:]):
            if i < len(self.attentions):
                x = self.attentions[i](x)
            x = resnet(x)
        return x


class HYDownBlock(nnx.Module):
    def __init__(self, in_channels: int, out_channels: int, num_layers: int,
                 groups: int, add_downsample: bool,
                 downsample_stride: tuple[int, int, int], *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        resnets = []
        for i in range(num_layers):
            cin = in_channels if i == 0 else out_channels
            resnets.append(HYResnetBlock(cin, out_channels, groups, **kw))
        self.resnets = nnx.List(resnets)
        self.downsamplers = (nnx.List([
            HYCausalConv3d(out_channels, out_channels, 3,
                           downsample_stride, **kw)
        ]) if add_downsample else None)

    def __call__(self, x: Array) -> Array:
        for resnet in self.resnets:
            x = resnet(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class HYUpBlock(nnx.Module):
    def __init__(self, in_channels: int, out_channels: int, num_layers: int,
                 groups: int, add_upsample: bool,
                 upsample_factor: tuple[int, int, int], *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        resnets = []
        for i in range(num_layers):
            cin = in_channels if i == 0 else out_channels
            resnets.append(HYResnetBlock(cin, out_channels, groups, **kw))
        self.resnets = nnx.List(resnets)
        self.upsample_factor = upsample_factor
        self.upsamplers = (nnx.List([
            HYCausalConv3d(out_channels, out_channels, 3, 1, **kw)
        ]) if add_upsample else None)

    def __call__(self, x: Array) -> Array:
        for resnet in self.resnets:
            x = resnet(x)
        if self.upsamplers is not None:
            ft, fh, fw = self.upsample_factor
            first, rest = x[:, :1], x[:, 1:]
            first = jnp.repeat(jnp.repeat(first, fh, axis=2), fw, axis=3)
            if rest.shape[1] > 0:
                rest = jnp.repeat(
                    jnp.repeat(jnp.repeat(rest, ft, axis=1), fh, axis=2),
                    fw, axis=3)
                x = jnp.concatenate([first, rest], axis=1)
            else:
                x = first
            x = self.upsamplers[0](x)
        return x


def _down_flags(i: int, n: int, tcr: int, scr: int) -> tuple[bool, bool]:
    ns = int(np.log2(scr))
    nt = int(np.log2(tcr))
    is_final = i == n - 1
    if tcr == 4:
        return bool(i < ns), bool(i >= n - 1 - nt and not is_final)
    return bool(i < ns), bool(i < nt)


class HunyuanVideoEncoder3D(nnx.Module):
    def __init__(self, cfg: HunyuanVAEArchConfig, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        self.conv_in = HYCausalConv3d(cfg.in_channels, ch[0], 3, 1, **kw)
        blocks = []
        out_c = ch[0]
        for i in range(len(ch)):
            in_c, out_c = out_c, ch[i]
            sflag, tflag = _down_flags(i, len(ch),
                                       cfg.temporal_compression_ratio,
                                       cfg.spatial_compression_ratio)
            stride = ((2 if tflag else 1), (2 if sflag else 1),
                      (2 if sflag else 1))
            blocks.append(
                HYDownBlock(in_c, out_c, cfg.layers_per_block, g,
                            sflag or tflag, stride, **kw))
        self.down_blocks = nnx.List(blocks)
        self.mid_block = HYMidBlock(ch[-1], g, cfg.mid_block_add_attention,
                                    **kw)
        self.conv_norm_out = GroupNorm(g, ch[-1], **kw)
        self.conv_out = HYCausalConv3d(ch[-1], 2 * cfg.latent_channels, 3, 1,
                                       **kw)

    def __call__(self, x: Array) -> Array:
        x = self.conv_in(x)
        for block in self.down_blocks:
            x = block(x)
        x = self.mid_block(x)
        x = jax.nn.silu(self.conv_norm_out(x))
        return self.conv_out(x)


class HunyuanVideoDecoder3D(nnx.Module):
    def __init__(self, cfg: HunyuanVAEArchConfig, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        self.conv_in = HYCausalConv3d(cfg.latent_channels, ch[-1], 3, 1,
                                      **kw)
        self.mid_block = HYMidBlock(ch[-1], g, cfg.mid_block_add_attention,
                                    **kw)
        rev = list(reversed(ch))
        blocks = []
        out_c = rev[0]
        for i in range(len(ch)):
            in_c, out_c = out_c, rev[i]
            sflag, tflag = _down_flags(i, len(ch),
                                       cfg.temporal_compression_ratio,
                                       cfg.spatial_compression_ratio)
            factor = ((2 if tflag else 1), (2 if sflag else 1),
                      (2 if sflag else 1))
            blocks.append(
                HYUpBlock(in_c, out_c, cfg.layers_per_block + 1, g,
                          sflag or tflag, factor, **kw))
        self.up_blocks = nnx.List(blocks)
        self.conv_norm_out = GroupNorm(g, ch[0], **kw)
        self.conv_out = HYCausalConv3d(ch[0], cfg.out_channels, 3, 1, **kw)

    def __call__(self, x: Array) -> Array:
        x = self.conv_in(x)
        x = self.mid_block(x)
        for block in self.up_blocks:
            x = block(x)
        x = jax.nn.silu(self.conv_norm_out(x))
        return self.conv_out(x)


class AutoencoderKLHunyuanVideo(nnx.Module):
    """HunyuanVideo VAE (hunyuanvae.py:766-840); NCDHW at the API boundary."""

    def __init__(self, config: HunyuanVAEArchConfig,
                 load_encoder: bool = True, load_decoder: bool = True, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        z = config.latent_channels
        if load_encoder:
            self.encoder = HunyuanVideoEncoder3D(config, **kw)
            self.quant_conv = Conv1x1(2 * z, 2 * z, **kw)
        else:
            self.encoder = None
            self.quant_conv = None
        if load_decoder:
            self.decoder = HunyuanVideoDecoder3D(config, **kw)
            self.post_quant_conv = Conv1x1(z, z, **kw)
        else:
            self.decoder = None
            self.post_quant_conv = None

    def normalize_latents(self, latents: Array) -> Array:
        return latents * self.config.scaling_factor

    def denormalize_latents(self, latents: Array) -> Array:
        return latents.astype(jnp.float32) / self.config.scaling_factor

    def encode(self, x: Array) -> DiagonalGaussianDistribution:
        assert self.encoder is not None
        x = x.transpose(0, 2, 3, 4, 1)
        enc = self.quant_conv(self.encoder(x))
        return DiagonalGaussianDistribution(enc)

    def decode(self, z: Array, **kwargs) -> Array:
        assert self.decoder is not None
        z = z.transpose(0, 2, 3, 4, 1)
        out = self.decoder(self.post_quant_conv(z))
        return out.astype(jnp.float32).transpose(0, 4, 1, 2, 3)


EntryClass = AutoencoderKLHunyuanVideo
