"""LTX-2 causal video VAE, TPU-native (channels-last internal).

Behavioral reference: /root/reference/fastvideo/models/vaes/ltx2vae.py
(:368-1760): 4x4 pixel patchify at both ends, causal 3D convs that pad
time by REPEATING the first frame (reflect spatial padding in the
decoder), PixelNorm (channel RMS), space-to-depth/depth-to-space
down/up blocks with channel-group residuals, per-channel latent
statistics buffers, and a timestep-conditioned decoder (decode noise
0.025 at sigma 0.05 with a final AdaLN).

Block lists come from the checkpoint config ("encoder_blocks" /
"decoder_blocks"); the builders here mirror _make_{encoder,decoder}_block.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.base import ModelConfig, VAEArchConfig
from fastvideo_tpu.models.vaes.wan import DiagonalGaussianDistribution

Array = jax.Array

LTX2_VAE_PARAM_NAMES_MAPPING: dict[str, str] = {
    # buffer names carry dashes in the checkpoint
    r"^(.*per_channel_statistics)\.std-of-means$": r"\1.std_of_means",
    r"^(.*per_channel_statistics)\.mean-of-means$": r"\1.mean_of_means",
    r"^(.*per_channel_statistics)\.mean-of-stds$": r"\1.mean_of_stds",
    r"^(.*per_channel_statistics)\.mean-of-stds_over_std-of-means$":
    r"\1.mean_of_stds_over_std_of_means",
    # torch CausalConv3d wraps nn.Conv3d in `.conv`
    r"^(.*)\.conv\.(weight|bias)$": r"\1.\2",
}


@dataclasses.dataclass
class LTX2VAEArchConfig(VAEArchConfig):
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 128
    patch_size: int = 4
    encoder_blocks: tuple = (
        ("res_x", {"num_layers": 4}),
        ("compress_space_res", {"multiplier": 2}),
        ("res_x", {"num_layers": 6}),
        ("compress_time_res", {"multiplier": 2}),
        ("res_x", {"num_layers": 6}),
        ("compress_all_res", {"multiplier": 2}),
        ("res_x", {"num_layers": 2}),
        ("compress_all_res", {"multiplier": 2}),
        ("res_x", {"num_layers": 2}),
    )
    decoder_blocks: tuple = (
        ("res_x", {"num_layers": 5, "inject_noise": False}),
        ("compress_all", {"residual": True, "multiplier": 2}),
        ("res_x", {"num_layers": 5, "inject_noise": False}),
        ("compress_all", {"residual": True, "multiplier": 2}),
        ("res_x", {"num_layers": 5, "inject_noise": False}),
        ("compress_all", {"residual": True, "multiplier": 2}),
        ("res_x", {"num_layers": 5, "inject_noise": False}),
    )
    timestep_conditioning: bool = True
    causal_decoder: bool = False
    scaling_factor: float = 1.0

    _SPATIAL_STRIDES = {"compress_all": 2, "compress_space": 2,
                        "compress_all_res": 2, "compress_space_res": 2,
                        "compress_all_x_y": 2}
    _TEMPORAL_STRIDES = {"compress_all": 2, "compress_time": 2,
                         "compress_all_res": 2, "compress_time_res": 2,
                         "compress_all_x_y": 2}

    @property
    def spatial_compression_ratio(self) -> int:
        r = self.patch_size
        for name, _ in self.encoder_blocks:
            r *= self._SPATIAL_STRIDES.get(name, 1)
        return r

    @property
    def temporal_compression_ratio(self) -> int:
        r = 1
        for name, _ in self.encoder_blocks:
            r *= self._TEMPORAL_STRIDES.get(name, 1)
        return r

    @property
    def z_dim(self) -> int:
        return self.latent_channels


@dataclasses.dataclass
class LTX2VAEConfig(ModelConfig):
    arch_config: LTX2VAEArchConfig = dataclasses.field(
        default_factory=LTX2VAEArchConfig)
    param_names_mapping: dict = dataclasses.field(
        default_factory=lambda: dict(LTX2_VAE_PARAM_NAMES_MAPPING))


class LTXCausalConv3d(nnx.Module):
    """Causal conv over NDHWC: temporal pad repeats frame 0 (or symmetric
    first/last for non-causal); spatial pad zeros or reflect
    (reference CausalConv3d :479-536)."""

    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: int = 3,
                 stride: int | tuple[int, int, int] = 1,
                 spatial_mode: str = "zeros", *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        k = (kernel_size,) * 3 if isinstance(kernel_size, int) \
            else tuple(kernel_size)
        self.kernel_size = k
        self.stride = (stride,) * 3 if isinstance(stride, int) \
            else tuple(stride)
        self.spatial_mode = spatial_mode
        init = nnx.initializers.lecun_normal(in_axis=(0, 1, 2, 3),
                                             out_axis=4)
        self.weight = nnx.Param(
            init(rngs.params(), (*k, in_channels, out_channels),
                 param_dtype))
        self.bias = nnx.Param(jnp.zeros((out_channels,), param_dtype))

    def __call__(self, x: Array, causal: bool = True) -> Array:
        kt, kh, kw = self.kernel_size
        if kt > 1:
            if causal:
                first = jnp.repeat(x[:, :1], kt - 1, axis=1)
                x = jnp.concatenate([first, x], axis=1)
            else:
                n = (kt - 1) // 2
                first = jnp.repeat(x[:, :1], n, axis=1)
                last = jnp.repeat(x[:, -1:], n, axis=1)
                x = jnp.concatenate([first, x, last], axis=1)
        ph, pw = kh // 2, kw // 2
        if ph or pw:
            mode = "reflect" if self.spatial_mode == "reflect" else \
                "constant"
            x = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw), (0, 0)),
                        mode=mode)
        out = jax.lax.conv_general_dilated(
            x, self.weight.value.astype(x.dtype),
            window_strides=self.stride, padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return out + self.bias.value.astype(out.dtype)


class LTXConv1x1(nnx.Module):
    def __init__(self, in_channels: int, out_channels: int, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.weight = nnx.Param(
            init(rngs.params(), (in_channels, out_channels), param_dtype))
        self.bias = nnx.Param(jnp.zeros((out_channels,), param_dtype))

    def __call__(self, x: Array) -> Array:
        return x @ self.weight.value.astype(x.dtype) + \
            self.bias.value.astype(x.dtype)


def pixel_norm(x: Array, eps: float = 1e-8) -> Array:
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf / jnp.sqrt(ms + eps)).astype(x.dtype)


class PerChannelStatistics(nnx.Module):
    def __init__(self, latent_channels: int, *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs | None = None):
        del rngs
        self.std_of_means = nnx.BatchStat(
            jnp.ones((latent_channels,), param_dtype))
        self.mean_of_means = nnx.BatchStat(
            jnp.zeros((latent_channels,), param_dtype))
        self.mean_of_stds = nnx.BatchStat(
            jnp.ones((latent_channels,), param_dtype))
        self.mean_of_stds_over_std_of_means = nnx.BatchStat(
            jnp.ones((latent_channels,), param_dtype))
        self.channel = nnx.BatchStat(
            jnp.arange(latent_channels, dtype=jnp.float32))

    def normalize(self, x: Array) -> Array:  # channels-last
        std = self.std_of_means.value.astype(jnp.float32)
        mean = self.mean_of_means.value.astype(jnp.float32)
        return ((x.astype(jnp.float32) - mean) / std).astype(x.dtype)

    def un_normalize(self, x: Array) -> Array:
        std = self.std_of_means.value.astype(jnp.float32)
        mean = self.mean_of_means.value.astype(jnp.float32)
        return (x.astype(jnp.float32) * std + mean).astype(x.dtype)


class ResnetBlock3D(nnx.Module):
    """(reference :610-763); pixel-norm variant with optional timestep
    conditioning (decoder res_x blocks)."""

    def __init__(self, in_channels: int, out_channels: int,
                 timestep_conditioning: bool = False,
                 spatial_mode: str = "zeros", *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.conv1 = LTXCausalConv3d(in_channels, out_channels, 3, 1,
                                     spatial_mode, **kw)
        self.conv2 = LTXCausalConv3d(out_channels, out_channels, 3, 1,
                                     spatial_mode, **kw)
        self.conv_shortcut = (LTXConv1x1(in_channels, out_channels, **kw)
                              if in_channels != out_channels else None)
        self.norm3_weight = (nnx.Param(jnp.ones((in_channels,),
                                                param_dtype))
                             if in_channels != out_channels else None)
        self.norm3_bias = (nnx.Param(jnp.zeros((in_channels,),
                                               param_dtype))
                           if in_channels != out_channels else None)
        self.timestep_conditioning = timestep_conditioning
        if timestep_conditioning:
            self.scale_shift_table = nnx.Param(
                jax.random.normal(rngs.params(), (4, in_channels),
                                  param_dtype) / in_channels**0.5)

    def __call__(self, x: Array, causal: bool = True,
                 timestep_embed: Array | None = None) -> Array:
        h = pixel_norm(x)
        if self.timestep_conditioning:
            assert timestep_embed is not None
            # timestep_embed [B, 4*C]; table [4, C]
            b = x.shape[0]
            ada = (self.scale_shift_table.value[None].astype(jnp.float32) +
                   timestep_embed.reshape(b, 4, -1).astype(jnp.float32))
            sh1, sc1, sh2, sc2 = (ada[:, i][:, None, None, None]
                                  for i in range(4))
            h = (h.astype(jnp.float32) * (1 + sc1) + sh1).astype(h.dtype)
        h = self.conv1(jax.nn.silu(h), causal=causal)
        h = pixel_norm(h)
        if self.timestep_conditioning:
            h = (h.astype(jnp.float32) * (1 + sc2) + sh2).astype(h.dtype)
        h = self.conv2(jax.nn.silu(h), causal=causal)
        res = x
        if self.conv_shortcut is not None:
            # norm3 = GroupNorm(groups=1) == LayerNorm over (C, spatial)
            xf = res.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(1, 2, 3, 4), keepdims=True)
            var = jnp.var(xf, axis=(1, 2, 3, 4), keepdims=True)
            xf = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
            xf = (xf * self.norm3_weight.value.astype(jnp.float32) +
                  self.norm3_bias.value.astype(jnp.float32))
            res = self.conv_shortcut(xf.astype(res.dtype))
        return res + h


class LTXTimeEmbedder(nnx.Module):
    """PixArtAlphaCombinedTimestepSizeEmbeddings (reference :844-901):
    sinusoid(256) -> linear -> silu -> linear."""

    def __init__(self, dim: int, *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        from fastvideo_tpu.layers.linear import Linear

        class _Embedder(nnx.Module):
            def __init__(self):
                self.linear_1 = Linear(256, dim, **kw)
                self.linear_2 = Linear(dim, dim, **kw)

        self.timestep_embedder = _Embedder()

    def __call__(self, t: Array, dtype) -> Array:
        half = 128
        freqs = jnp.exp(-math.log(10000.0) *
                        jnp.arange(half, dtype=jnp.float32) / half)
        args = t.astype(jnp.float32)[:, None] * freqs[None]
        proj = jnp.concatenate([jnp.cos(args), jnp.sin(args)],
                               axis=-1).astype(dtype)
        e = self.timestep_embedder.linear_1(proj)
        return self.timestep_embedder.linear_2(jax.nn.silu(e))


class UNetMidBlock3D(nnx.Module):
    def __init__(self, channels: int, num_layers: int,
                 timestep_conditioning: bool = False,
                 spatial_mode: str = "zeros", *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.timestep_conditioning = timestep_conditioning
        if timestep_conditioning:
            self.time_embedder = LTXTimeEmbedder(channels * 4, **kw)
        self.res_blocks = nnx.List([
            ResnetBlock3D(channels, channels, timestep_conditioning,
                          spatial_mode, **kw) for _ in range(num_layers)
        ])

    def __call__(self, x: Array, causal: bool = True,
                 timestep: Array | None = None) -> Array:
        temb = None
        if self.timestep_conditioning:
            temb = self.time_embedder(timestep.reshape(-1), x.dtype)
        for block in self.res_blocks:
            x = block(x, causal=causal, timestep_embed=temb)
        return x


def _s2d(x: Array, stride: tuple[int, int, int]) -> Array:
    """b (d p1) (h p2) (w p3) c -> b d h w (c p1 p2 p3)... matching the
    torch channel order (c p1 p2 p3) with channels-first rearrange."""
    b, d, h, w, c = x.shape
    p1, p2, p3 = stride
    x = x.reshape(b, d // p1, p1, h // p2, p2, w // p3, p3, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(b, d // p1, h // p2, w // p3, c * p1 * p2 * p3)


def _d2s(x: Array, stride: tuple[int, int, int]) -> Array:
    b, d, h, w, cp = x.shape
    p1, p2, p3 = stride
    c = cp // (p1 * p2 * p3)
    x = x.reshape(b, d, h, w, c, p1, p2, p3)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, d * p1, h * p2, w * p3, c)


class SpaceToDepthDownsample(nnx.Module):
    """(reference :902-952)."""

    def __init__(self, in_channels: int, out_channels: int,
                 stride: tuple[int, int, int], spatial_mode: str = "zeros",
                 *, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.stride = tuple(stride)
        self.group_size = in_channels * math.prod(stride) // out_channels
        self.conv = LTXCausalConv3d(in_channels,
                                    out_channels // math.prod(stride), 3,
                                    1, spatial_mode,
                                    param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: Array, causal: bool = True) -> Array:
        if self.stride[0] == 2:
            x = jnp.concatenate([x[:, :1], x], axis=1)
        x_in = _s2d(x, self.stride)
        b, d, h, w, cg = x_in.shape
        x_in = jnp.mean(
            x_in.reshape(b, d, h, w, cg // self.group_size,
                         self.group_size), axis=-1)
        h_out = self.conv(x, causal=causal)
        h_out = _s2d(h_out, self.stride)
        return h_out + x_in


class DepthToSpaceUpsample(nnx.Module):
    """(reference :953-1011)."""

    def __init__(self, in_channels: int, stride: tuple[int, int, int],
                 residual: bool = False, reduction: int = 1,
                 spatial_mode: str = "zeros", *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        self.stride = tuple(stride)
        self.residual = residual
        self.reduction = reduction
        self.out_channels = math.prod(stride) * in_channels // reduction
        self.conv = LTXCausalConv3d(in_channels, self.out_channels, 3, 1,
                                    spatial_mode, param_dtype=param_dtype,
                                    rngs=rngs)

    def __call__(self, x: Array, causal: bool = True) -> Array:
        if self.residual:
            x_in = _d2s(x, self.stride)
            reps = math.prod(self.stride) // self.reduction
            x_in = jnp.tile(x_in, (1, 1, 1, 1, reps))
            if self.stride[0] == 2:
                x_in = x_in[:, 1:]
        h = self.conv(x, causal=causal)
        h = _d2s(h, self.stride)
        if self.stride[0] == 2:
            h = h[:, 1:]
        if self.residual:
            h = h + x_in
        return h


def _pixel_patchify(x: Array, p: int) -> Array:
    """NCDHW -> NDHWC tokens with the torch (c p r q)=(c, pt, w-r, h-q)
    channel order (reference patchify :368-396: 'b c (f p) (h q) (w r) ->
    b (c p r q) f h w')."""
    b, c, f, hh, ww = x.shape
    x = x.reshape(b, c, f, hh // p, p, ww // p, p)
    # target channel order (c, r=w-patch, q=h-patch)
    x = x.transpose(0, 2, 3, 5, 1, 6, 4)  # b f h w c r q
    return x.reshape(b, f, hh // p, ww // p, c * p * p)


def _pixel_unpatchify(x: Array, p: int, out_channels: int) -> Array:
    """NDHWC tokens -> NCDHW pixels (inverse of _pixel_patchify)."""
    b, f, hh, ww, cp = x.shape
    c = out_channels
    x = x.reshape(b, f, hh, ww, c, p, p)  # (c, r, q)
    x = x.transpose(0, 4, 1, 2, 6, 3, 5)  # b c f h q w r
    return x.reshape(b, c, f, hh * p, ww * p)


class LTX2VideoEncoder(nnx.Module):
    def __init__(self, cfg: LTX2VAEArchConfig, *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        mode = "zeros"
        ch = cfg.latent_channels
        self.patch_size = cfg.patch_size
        self.per_channel_statistics = PerChannelStatistics(
            cfg.latent_channels, **kw)
        self.conv_in = LTXCausalConv3d(
            cfg.in_channels * cfg.patch_size**2, ch, 3, 1, mode, **kw)
        blocks = []
        feat = ch
        for name, params in cfg.encoder_blocks:
            params = dict(params) if isinstance(params, dict) else \
                {"num_layers": params}
            if name == "res_x":
                blocks.append(UNetMidBlock3D(feat, params["num_layers"],
                                             False, mode, **kw))
            elif name in ("compress_all_res", "compress_space_res",
                          "compress_time_res"):
                out = feat * params.get("multiplier", 2)
                stride = {"compress_all_res": (2, 2, 2),
                          "compress_space_res": (1, 2, 2),
                          "compress_time_res": (2, 1, 1)}[name]
                blocks.append(SpaceToDepthDownsample(feat, out, stride,
                                                     mode, **kw))
                feat = out
            elif name == "res_x_y":
                out = feat * params.get("multiplier", 2)
                blocks.append(ResnetBlock3D(feat, out, False, mode, **kw))
                feat = out
            elif name in ("compress_all", "compress_space",
                          "compress_time"):
                stride = {"compress_all": (2, 2, 2),
                          "compress_space": (1, 2, 2),
                          "compress_time": (2, 1, 1)}[name]
                blocks.append(LTXCausalConv3d(feat, feat, 3, stride, mode,
                                              **kw))
            else:
                raise ValueError(f"unknown encoder block {name}")
        self.down_blocks = nnx.List(blocks)
        # latent_log_var UNIFORM: one extra logvar channel
        self.conv_out = LTXCausalConv3d(feat, cfg.latent_channels + 1, 3,
                                        1, mode, **kw)

    def __call__(self, x: Array) -> Array:
        """x NCDHW pixels -> normalized latent means NDHWC."""
        x = _pixel_patchify(x, self.patch_size)
        x = self.conv_in(x)
        for block in self.down_blocks:
            x = block(x)
        x = self.conv_out(jax.nn.silu(pixel_norm(x)))
        means = x[..., :-1]
        return self.per_channel_statistics.normalize(means)


class LTX2VideoDecoder(nnx.Module):
    DECODE_NOISE_SCALE = 0.025
    DECODE_TIMESTEP = 0.05

    def __init__(self, cfg: LTX2VAEArchConfig, *, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        mode = "reflect"
        self.cfg = cfg
        self.causal = cfg.causal_decoder
        self.timestep_conditioning = cfg.timestep_conditioning
        self.patch_size = cfg.patch_size
        self.per_channel_statistics = PerChannelStatistics(
            cfg.latent_channels, **kw)
        # walk the reversed block list to find conv_in width
        feat = cfg.latent_channels
        for name, params in reversed(cfg.decoder_blocks):
            params = dict(params) if isinstance(params, dict) else {}
            if name == "res_x_y":
                feat *= params.get("multiplier", 2)
            elif name in ("compress_all", "compress_space",
                          "compress_time"):
                feat *= params.get("multiplier", 1)
        self.conv_in = LTXCausalConv3d(cfg.latent_channels, feat, 3, 1,
                                       mode, **kw)
        blocks = []
        for name, params in reversed(cfg.decoder_blocks):
            params = dict(params) if isinstance(params, dict) else \
                {"num_layers": params}
            if name in ("res_x", "attn_res_x"):
                blocks.append(UNetMidBlock3D(feat, params["num_layers"],
                                             cfg.timestep_conditioning,
                                             mode, **kw))
            elif name == "res_x_y":
                out = feat // params.get("multiplier", 2)
                blocks.append(ResnetBlock3D(feat, out, False, mode, **kw))
                feat = out
            elif name in ("compress_all", "compress_space",
                          "compress_time"):
                stride = {"compress_all": (2, 2, 2),
                          "compress_space": (1, 2, 2),
                          "compress_time": (2, 1, 1)}[name]
                red = params.get("multiplier", 1)
                blocks.append(DepthToSpaceUpsample(
                    feat, stride, residual=params.get("residual", False),
                    reduction=red, spatial_mode=mode, **kw))
                feat = blocks[-1].out_channels // math.prod(stride)
            else:
                raise ValueError(f"unknown decoder block {name}")
        self.up_blocks = nnx.List(blocks)
        self.conv_out = LTXCausalConv3d(
            feat, cfg.out_channels * cfg.patch_size**2, 3, 1, mode, **kw)
        if cfg.timestep_conditioning:
            self.timestep_scale_multiplier = nnx.Param(
                jnp.asarray(1000.0, param_dtype))
            self.last_time_embedder = LTXTimeEmbedder(feat * 2, **kw)
            self.last_scale_shift_table = nnx.Param(
                jax.random.normal(rngs.params(), (2, feat),
                                  param_dtype) * 0.02)

    def __call__(self, z: Array, timestep: Array | None = None,
                 noise: Array | None = None) -> Array:
        """z NDHWC normalized latents -> NDHWC pixels (patch tokens)."""
        b = z.shape[0]
        if self.timestep_conditioning:
            if noise is None:
                noise = jax.random.normal(jax.random.PRNGKey(0), z.shape,
                                          z.dtype)
            z = noise * self.DECODE_NOISE_SCALE + \
                (1.0 - self.DECODE_NOISE_SCALE) * z
            if timestep is None:
                timestep = jnp.full((b,), self.DECODE_TIMESTEP,
                                    jnp.float32)
        z = self.per_channel_statistics.un_normalize(z)
        x = self.conv_in(z, causal=self.causal)
        scaled_t = None
        if self.timestep_conditioning:
            scaled_t = timestep * \
                self.timestep_scale_multiplier.value.astype(jnp.float32)
        for block in self.up_blocks:
            if isinstance(block, UNetMidBlock3D):
                x = block(x, causal=self.causal, timestep=scaled_t)
            else:
                x = block(x, causal=self.causal)
        x = pixel_norm(x)
        if self.timestep_conditioning:
            emb = self.last_time_embedder(scaled_t.reshape(-1), x.dtype)
            ada = (self.last_scale_shift_table.value[None]
                   .astype(jnp.float32) +
                   emb.reshape(b, 2, -1).astype(jnp.float32))
            shift = ada[:, 0][:, None, None, None]
            scale = ada[:, 1][:, None, None, None]
            x = (x.astype(jnp.float32) * (1 + scale) + shift).astype(
                x.dtype)
        return self.conv_out(jax.nn.silu(x), causal=self.causal)


class LTX2CausalVideoAutoencoder(nnx.Module):
    """NCDHW at the API boundary (reference :1611-1760)."""

    def __init__(self, config: LTX2VAEArchConfig,
                 load_encoder: bool = True, load_decoder: bool = True, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        kw = dict(param_dtype=param_dtype, rngs=rngs)
        self.encoder = LTX2VideoEncoder(config, **kw) if load_encoder \
            else None
        self.decoder = LTX2VideoDecoder(config, **kw) if load_decoder \
            else None

    def normalize_latents(self, latents: Array) -> Array:
        return latents  # per-channel stats applied inside encode/decode

    def denormalize_latents(self, latents: Array) -> Array:
        return latents

    def encode(self, x: Array) -> DiagonalGaussianDistribution:
        assert self.encoder is not None
        means = self.encoder(x)  # NDHWC
        moments = jnp.concatenate(
            [means, jnp.full_like(means, -30.0)], axis=-1)
        return DiagonalGaussianDistribution(moments)

    def decode(self, z: Array, timestep: Array | None = None,
               noise: Array | None = None, **kwargs) -> Array:
        assert self.decoder is not None
        z = z.transpose(0, 2, 3, 4, 1)  # NDHWC
        out = self.decoder(z, timestep=timestep, noise=noise)
        return _pixel_unpatchify(out.astype(jnp.float32),
                                 self.config.patch_size,
                                 self.config.out_channels)


EntryClass = LTX2CausalVideoAutoencoder
