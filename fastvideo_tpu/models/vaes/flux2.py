"""FLUX.2 image VAE: AutoencoderKL + per-block attention + latent BN stats.

Behavioral reference: /root/reference/fastvideo/models/vaes/flux2vae.py
(:28-330) and configs/models/vaes/flux2vae.py: a standard diffusers 2D KL
autoencoder whose LAST encoder stage / FIRST decoder stage carry attention
after every resnet (Attn{Down,Up}Block2D), quant/post-quant 1x1 convs, and
a ``bn`` BatchNorm2d (affine=False) whose RUNNING STATS denormalize the
2x2-packed latents before decode (reference pipelines/stages/decoding.py:
131-143). The packed-latent (un)patchify itself lives in the pipeline.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.base import ModelConfig, VAEArchConfig
from fastvideo_tpu.models.vaes.autoencoder_kl import (Conv2d, GroupNorm,
                                                      MidBlock2D,
                                                      Downsample2D,
                                                      ResnetBlock2D,
                                                      Upsample2D,
                                                      VAEAttention2D)
from fastvideo_tpu.models.vaes.wan import DiagonalGaussianDistribution

Array = jax.Array

FLUX2_VAE_PARAM_NAMES_MAPPING: dict[str, str] = {
    r"^(.*)\.to_out\.0\.(weight|bias)$": r"\1.to_out.\2",
}


@dataclasses.dataclass
class Flux2VAEArchConfig(VAEArchConfig):
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 32
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 1.0
    shift_factor: float = 0.0
    use_quant_conv: bool = True
    use_post_quant_conv: bool = True
    mid_block_add_attention: bool = True
    # which stages carry per-resnet attention (diffusers block types):
    # encoder: attention on the LAST stage; decoder: on the FIRST.
    attn_encoder_blocks: tuple[int, ...] = (3,)
    attn_decoder_blocks: tuple[int, ...] = (0,)
    batch_norm_eps: float = 1e-5
    patch_size: tuple[int, int] = (2, 2)
    sample_size: int = 1024

    @property
    def spatial_compression_ratio(self) -> int:
        return 2**(len(self.block_out_channels) - 1)

    @property
    def temporal_compression_ratio(self) -> int:
        return 1

    @property
    def z_dim(self) -> int:
        return self.latent_channels


@dataclasses.dataclass
class Flux2VAEConfig(ModelConfig):
    arch_config: Flux2VAEArchConfig = dataclasses.field(
        default_factory=Flux2VAEArchConfig)
    param_names_mapping: dict[str, str] = dataclasses.field(
        default_factory=lambda: dict(FLUX2_VAE_PARAM_NAMES_MAPPING))


class AttnDownEncoderBlock2D(nnx.Module):
    """resnet -> attention per layer, then downsample (diffusers)."""

    def __init__(self, in_channels: int, out_channels: int, num_layers: int,
                 groups: int, add_downsample: bool, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.resnets = nnx.List([
            ResnetBlock2D(in_channels if i == 0 else out_channels,
                          out_channels, groups, **kw)
            for i in range(num_layers)
        ])
        self.attentions = nnx.List(
            [VAEAttention2D(out_channels, groups, **kw)
             for _ in range(num_layers)])
        self.downsamplers = (nnx.List([Downsample2D(out_channels, **kw)])
                             if add_downsample else None)

    def __call__(self, x: Array) -> Array:
        for resnet, attn in zip(self.resnets, self.attentions):
            x = attn(resnet(x))
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class AttnUpDecoderBlock2D(nnx.Module):
    def __init__(self, in_channels: int, out_channels: int, num_layers: int,
                 groups: int, add_upsample: bool, *, param_dtype,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.resnets = nnx.List([
            ResnetBlock2D(in_channels if i == 0 else out_channels,
                          out_channels, groups, **kw)
            for i in range(num_layers)
        ])
        self.attentions = nnx.List(
            [VAEAttention2D(out_channels, groups, **kw)
             for _ in range(num_layers)])
        self.upsamplers = (nnx.List([Upsample2D(out_channels, **kw)])
                           if add_upsample else None)

    def __call__(self, x: Array) -> Array:
        for resnet, attn in zip(self.resnets, self.attentions):
            x = attn(resnet(x))
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class Flux2Encoder2D(nnx.Module):
    def __init__(self, cfg: Flux2VAEArchConfig, *, param_dtype,
                 rngs: nnx.Rngs):
        from fastvideo_tpu.models.vaes.autoencoder_kl import (
            DownEncoderBlock2D)

        kw = dict(param_dtype=param_dtype, rngs=rngs)
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        self.conv_in = Conv2d(cfg.in_channels, ch[0], 3, 1, 1, **kw)
        blocks = []
        out_c = ch[0]
        for i in range(len(ch)):
            in_c, out_c = out_c, ch[i]
            cls = (AttnDownEncoderBlock2D
                   if i in cfg.attn_encoder_blocks else DownEncoderBlock2D)
            blocks.append(
                cls(in_c, out_c, cfg.layers_per_block, g,
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


class Flux2Decoder2D(nnx.Module):
    def __init__(self, cfg: Flux2VAEArchConfig, *, param_dtype,
                 rngs: nnx.Rngs):
        from fastvideo_tpu.models.vaes.autoencoder_kl import UpDecoderBlock2D

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
            cls = (AttnUpDecoderBlock2D
                   if i in cfg.attn_decoder_blocks else UpDecoderBlock2D)
            blocks.append(
                cls(in_c, out_c, cfg.layers_per_block + 1, g,
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


class Flux2LatentBN(nnx.Module):
    """Running stats of the reference's affine-free BatchNorm2d on PACKED
    latents. Inference only uses the stats (decoding.py:131-143)."""

    def __init__(self, channels: int, *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs | None = None):
        del rngs
        self.running_mean = nnx.BatchStat(jnp.zeros((channels,), param_dtype))
        self.running_var = nnx.BatchStat(jnp.ones((channels,), param_dtype))


class AutoencoderKLFlux2(nnx.Module):
    """FLUX.2 VAE; NCHW at the API boundary like AutoencoderKL."""

    def __init__(self, config: Flux2VAEArchConfig,
                 load_encoder: bool = True, load_decoder: bool = True, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.encoder = Flux2Encoder2D(config, **kw) if load_encoder else None
        self.decoder = Flux2Decoder2D(config, **kw) if load_decoder else None
        z = config.latent_channels
        self.quant_conv = (Conv2d(2 * z, 2 * z, 1, 1, 0, **kw)
                           if config.use_quant_conv else None)
        self.post_quant_conv = (Conv2d(z, z, 1, 1, 0, **kw)
                                if config.use_post_quant_conv else None)
        ph, pw = config.patch_size
        self.bn = Flux2LatentBN(ph * pw * z, **kw)

    def bn_denormalize(self, packed: Array) -> Array:
        """Packed [B, 4z, h, w] latents: x * sqrt(var + eps) + mean
        (reference decoding.py:131-143)."""
        mean = self.bn.running_mean.value.astype(jnp.float32)
        var = self.bn.running_var.value.astype(jnp.float32)
        eps = self.config.batch_norm_eps
        std = jnp.sqrt(jnp.maximum(var + eps, 1e-6))
        x = packed.astype(jnp.float32)
        return x * std[None, :, None, None] + mean[None, :, None, None]

    def bn_normalize(self, packed: Array) -> Array:
        mean = self.bn.running_mean.value.astype(jnp.float32)
        var = self.bn.running_var.value.astype(jnp.float32)
        eps = self.config.batch_norm_eps
        std = jnp.sqrt(jnp.maximum(var + eps, 1e-6))
        x = packed.astype(jnp.float32)
        return (x - mean[None, :, None, None]) / std[None, :, None, None]

    def normalize_latents(self, latents: Array) -> Array:
        return latents  # flux2 latents pass through (BN handles stats)

    def denormalize_latents(self, latents: Array) -> Array:
        return latents

    def encode(self, x: Array) -> DiagonalGaussianDistribution:
        assert self.encoder is not None
        if x.ndim == 5:
            x = x[:, :, 0]
        moments = self.encoder(x.transpose(0, 2, 3, 1))
        if self.quant_conv is not None:
            moments = self.quant_conv(moments)
        return DiagonalGaussianDistribution(moments)

    def decode(self, z: Array, **kwargs) -> Array:
        assert self.decoder is not None
        x = z.transpose(0, 2, 3, 1)
        if self.post_quant_conv is not None:
            x = self.post_quant_conv(x)
        out = self.decoder(x)
        return out.astype(jnp.float32).transpose(0, 3, 1, 2)


EntryClass = AutoencoderKLFlux2
