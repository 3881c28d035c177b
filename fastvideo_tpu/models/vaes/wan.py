"""Wan 3D causal VAE (AutoencoderKLWan), TPU-native.

Behavioral reference: /root/reference/fastvideo/models/vaes/wanvae.py
(WanCausalConv3d/WanEncoder3d/WanDecoder3d/AutoencoderKLWan, :157-1379).

TPU-first redesign: the reference streams frame-chunks through python-side
``feat_cache`` lists (one cached conv input per causal conv). That pattern is
host-loop-bound and jit-hostile. Here the **entire clip is processed in one
XLA program** using true causal padding; the chunked-cache semantics are
reproduced exactly by the first-frame split:

* decoder ``upsample3d``: the reference never temporally-upsamples latent
  frame 0 (the "Rep" branch, wanvae.py:336-372). We split ``[f0 | rest]``,
  apply the doubling time-conv only to ``rest`` (causally zero-padded), and
  re-concatenate. All other causal convs stream continuously across the
  boundary — identical math to the cache version, no python loop.
* encoder ``downsample3d``: frame 0 passes through; frames 1.. are stride-2
  causally convolved with frame 0 as left context (wanvae.py:389-401).

Layout is channels-last (NDHWC) internally — the native layout for XLA:TPU
convolutions — with the reference's NCDHW at the public API boundary.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig

Array = jax.Array

_VAE_CONV3D_DEFAULT: str | None = None


def _vae_conv3d_mode() -> str:
    """Conv formulation for the VAE hot path: ``FASTVIDEO_VAE_CONV3D``
    overrides; the measured default on TPU is the Pallas "auto" policy —
    per-shape choice between the transposed-orientation "thcw" kernel
    (wide low-channel stages: 82-88 TF/s vs tap's 67-72 at the 96/192-ch
    decoder stages) and the "tap" kernel (narrow frames / tiny K, where
    tap's long M rows win). Cold compile stays 19-29s vs 495s for the XLA
    conv path at the 81f/480p workload. Elsewhere (CPU tests) Pallas
    would run in interpreter mode, so XLA convs stay the default."""
    global _VAE_CONV3D_DEFAULT
    env = os.getenv("FASTVIDEO_VAE_CONV3D")
    if env is not None:
        return env
    if _VAE_CONV3D_DEFAULT is None:
        _VAE_CONV3D_DEFAULT = ("auto"
                               if jax.default_backend() == "tpu" else "")
    return _VAE_CONV3D_DEFAULT


class StreamCache:
    """Functional conv-cache bookkeeping for chunked/streaming decode.

    Each temporal conv consumes one entry (its last 2 input frames from the
    previous chunk, in call order) and emits the updated entry. The entry
    list is a plain pytree, so a chunk-decode step jits/scans cleanly.
    Reference analog: the ``feat_cache``/``feat_idx`` lists
    (wanvae.py:1163-1181) — but threaded functionally instead of mutated.
    """

    def __init__(self, entries: list[Array] | None):
        self.entries = entries
        self.idx = 0
        self.out: list[Array] = []

    def pop(self) -> Array | None:
        if self.entries is None:
            self.idx += 1
            return None
        e = self.entries[self.idx]
        self.idx += 1
        return e

    def push(self, e: Array) -> None:
        self.out.append(e)


class CausalConv3d(nnx.Module):
    """3D conv, temporally causal (left-pad 2*pt zeros; wanvae.py:157-206).

    Weight stored in DHWIO layout; the loader transposes torch's OIDHW.
    """

    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: int | tuple[int, int, int],
                 stride: int | tuple[int, int, int] = 1,
                 padding: int | tuple[int, int, int] = 0, *,
                 param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size,) * 3
        if isinstance(stride, int):
            stride = (stride,) * 3
        if isinstance(padding, int):
            padding = (padding,) * 3
        self.kernel_size = kernel_size
        self.stride = stride
        self.pad = padding
        init = nnx.initializers.lecun_normal(in_axis=(0, 1, 2, 3),
                                             out_axis=4)
        self.weight = nnx.Param(
            init(rngs.params(), (*kernel_size, in_channels, out_channels),
                 param_dtype))
        self.bias = nnx.Param(jnp.zeros((out_channels,), param_dtype))

    def __call__(self, x: Array, *, time_pad: int | None = None,
                 ctx: StreamCache | None = None,
                 gamma: Array | None = None) -> Array:
        """x: [B, T, H, W, C]. ``time_pad`` overrides the causal left pad.

        With a StreamCache, the causal left context comes from the previous
        chunk's cached frames instead of zero padding, and the updated cache
        (last ``2*pt`` input frames) is recorded. ``gamma`` fuses a
        preceding RMSNorm+SiLU into the Pallas conv kernel (the cached
        frames are raw pre-norm activations either way, so streaming
        chunked decode stays bit-identical).
        """
        pt, ph, pw = self.pad
        tp = 2 * pt if time_pad is None else time_pad
        if ctx is not None and tp > 0:
            prev = ctx.pop()
            if prev is not None:
                x = jnp.concatenate([prev.astype(x.dtype), x], axis=1)
                tp = 0
            # cache = last tp_frames of the (unpadded-right) causal stream;
            # zero-fill if the chunk is shorter than the context.
            need = 2 * pt if time_pad is None else time_pad
            if prev is None:
                need = 2 * pt
            tail = x[:, -need:]
            if tail.shape[1] < need:
                tail = jnp.pad(
                    tail, ((0, 0), (need - tail.shape[1], 0), (0, 0), (0, 0),
                           (0, 0)))
            # Anchor the tail so it materializes as its own (tiny) buffer
            # right here. Left to its own devices XLA schedules these cache
            # slices at the end of the chunk-scan body, which keeps every
            # conv's full-size normed input alive simultaneously (observed
            # as ~7 live [T,480,832,96] buffers in the HBM OOM dump).
            ctx.push(jax.lax.optimization_barrier(tail))
        w = self.weight.value.astype(x.dtype)
        kt, kh, kw = self.kernel_size
        st, sh, sw = self.stride
        conv_mode = _vae_conv3d_mode()
        if conv_mode:
            from fastvideo_tpu.ops import conv3d as conv3d_ops

            if conv3d_ops.supports(self.kernel_size, self.stride,
                                   (tp, ph, pw), x.shape[-1],
                                   w.shape[-1], w_dim=x.shape[3],
                                   mode=conv_mode, h_dim=x.shape[2]):
                # Pallas conv3d path (ops/conv3d.py): the kernel does its
                # own causal/spatial padding; mode picks the tap layout
                # ("tap" | "shift3" | "nb" | "dma" | "dw" | "dhw").
                g = gamma.astype(x.dtype) if gamma is not None else None
                return conv3d_ops.conv3d_ndhwc(
                    x, w, self.bias.value.astype(x.dtype), time_pad=tp,
                    mode=conv_mode, gamma=g)
        if gamma is not None:
            # Pallas path unavailable for this shape: apply the norm+silu
            # prologue explicitly (same math, unfused)
            sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                         keepdims=True)
            inv = ((x.shape[-1]**0.5) *
                   jax.lax.rsqrt(jnp.maximum(sq, 1e-24))).astype(x.dtype)
            x = jax.nn.silu(x * inv * gamma.astype(x.dtype))
        if (kh, kw) != (1, 1) and st == 1:
            # Temporal-tap decomposition into TRUE 2D NHWC convs with the
            # time dim folded into the conv batch. Measured 87.6 TF/s on
            # v5e at the decoder's hot shape vs 61.2 TF/s for XLA's direct
            # NDHWC 3D lowering (scripts/bench_vae_conv.py, overhead-
            # corrected) — the 5D (1,kh,kw) tap form is also slower.
            # Memory discipline (the decoder's full-res stage runs within
            # ~1 GB of HBM capacity): pad once, then make each temporal tap
            # a zero-copy leading-dim slice of the flattened batch.
            # Spatial padding inside the per-tap conv looks cheaper but
            # makes XLA materialize a padded copy per tap -> OOM.
            if tp or ph or pw:
                x = jnp.pad(x, ((0, 0), (tp, 0), (ph, ph), (pw, pw), (0, 0)))
            b, t_in, hh, ww, cin = x.shape
            n_out = t_in - kt + 1
            xflat = x.reshape(b * t_in, hh, ww, cin)
            out = None
            for dt in range(kt):
                if b == 1:
                    xt = xflat[dt:dt + n_out]
                else:
                    xt = x[:, dt:dt + n_out].reshape(b * n_out, hh, ww, cin)
                o = jax.lax.conv_general_dilated(
                    xt, w[dt], window_strides=(sh, sw), padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                # The barrier forces each tap's partial sum to retire before
                # the next tap's conv output materializes. Without it XLA
                # fuses all tap adds into one op whose operands are every
                # tap's full-size output at once — at the decoder's full-res
                # stage that blows past HBM (seen as add_add_fusion with 7
                # live [T,480,832,96] operands in the OOM allocation dump).
                out = o if out is None else jax.lax.optimization_barrier(
                    out + o)
            out = out.reshape(b, n_out, *out.shape[1:])
        else:
            if tp or ph or pw:
                x = jnp.pad(x,
                            ((0, 0), (tp, 0), (ph, ph), (pw, pw), (0, 0)))
            out = jax.lax.conv_general_dilated(
                x, w, window_strides=self.stride, padding="VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return out + self.bias.value.astype(out.dtype)


class WanRMSNorm(nnx.Module):
    """L2-normalize channels * sqrt(C) * gamma (wanvae.py:208-237)."""

    def __init__(self, dim: int, bias: bool = False, *,
                 param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        del rngs
        self.scale = dim**0.5
        self.gamma = nnx.Param(jnp.ones((dim,), param_dtype))
        self.bias = nnx.Param(jnp.zeros(
            (dim,), param_dtype)) if bias else None

    def __call__(self, x: Array) -> Array:
        # F.normalize: x / max(||x||_2, eps). The sum-of-squares reduces in
        # fp32 but the elementwise rescale stays in the input dtype so no
        # full-resolution fp32 temps materialize (HBM peak matters: the
        # decoder touches [T,480,832,96] tensors).
        sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                     keepdims=True)
        inv = (self.scale * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))).astype(
            x.dtype)
        out = x * inv * self.gamma.value.astype(x.dtype)
        if self.bias is not None:
            out = out + self.bias.value.astype(x.dtype)
        return out


class WanResidualBlock(nnx.Module):
    """norm-silu-conv x2 + shortcut (wanvae.py:405-494)."""

    def __init__(self, in_dim: int, out_dim: int, *,
                 param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        self.norm1 = WanRMSNorm(in_dim, param_dtype=param_dtype, rngs=rngs)
        self.conv1 = CausalConv3d(in_dim, out_dim, 3, padding=1,
                                  param_dtype=param_dtype, rngs=rngs)
        self.norm2 = WanRMSNorm(out_dim, param_dtype=param_dtype, rngs=rngs)
        self.conv2 = CausalConv3d(out_dim, out_dim, 3, padding=1,
                                  param_dtype=param_dtype, rngs=rngs)
        self.conv_shortcut = (CausalConv3d(in_dim, out_dim, 1,
                                           param_dtype=param_dtype, rngs=rngs)
                              if in_dim != out_dim else None)

    def _norm_silu_conv(self, conv: CausalConv3d, norm: WanRMSNorm,
                        x: Array, ctx: "StreamCache | None") -> Array:
        # Optional: fuse rmsnorm+silu into the Pallas conv kernel
        # (ops/conv3d.py gamma arg). Saves two full-size HBM round-trips
        # per conv but re-normalizes each block's halo rows and puts the
        # VPU norm in series with the MXU dots — measured round 4 it LOSES
        # (4.89s vs 4.15s resident decode at chunk=3), so it is opt-in via
        # FASTVIDEO_VAE_FUSE_NORM=1. Exact either way:
        # silu(rmsnorm(0)) == 0 on zero-padded borders.
        if (os.getenv("FASTVIDEO_VAE_FUSE_NORM", "0") == "1"
                and _vae_conv3d_mode() and norm.bias is None):
            from fastvideo_tpu.ops import conv3d as conv3d_ops

            if conv3d_ops.supports(conv.kernel_size, conv.stride, conv.pad,
                                   x.shape[-1], conv.weight.value.shape[-1]):
                return conv(x, ctx=ctx, gamma=norm.gamma.value)
        return conv(jax.nn.silu(norm(x)), ctx=ctx)

    def __call__(self, x: Array, ctx: "StreamCache | None" = None) -> Array:
        h = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        x = self._norm_silu_conv(self.conv1, self.norm1, x, ctx)
        x = self._norm_silu_conv(self.conv2, self.norm2, x, ctx)
        return x + h


class WanAttentionBlock(nnx.Module):
    """Per-frame single-head spatial self-attention (wanvae.py:496-541)."""

    def __init__(self, dim: int, *, param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs):
        self.dim = dim
        self.norm = WanRMSNorm(dim, param_dtype=param_dtype, rngs=rngs)
        self.to_qkv = CausalConv3d(dim, dim * 3, 1, param_dtype=param_dtype,
                                   rngs=rngs)
        self.proj = CausalConv3d(dim, dim, 1, param_dtype=param_dtype,
                                 rngs=rngs)

    def __call__(self, x: Array) -> Array:
        identity = x
        b, t, h, w, c = x.shape
        qkv = self.to_qkv(self.norm(x))  # [B, T, H, W, 3C]
        qkv = qkv.reshape(b * t, h * w, 3 * c)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # Pallas flash kernel: 12 ms vs 242 ms for XLA SDPA at the
        # mid-block's [21, 6240, 1, 384] shape (v5e, overhead-corrected) —
        # XLA materializes the 3.3 GB score tensor, flash never does.
        from fastvideo_tpu.ops.flash_attention import flash_attention
        out = flash_attention(q[:, :, None], k[:, :, None], v[:, :, None])
        out = out[:, :, 0].reshape(b, t, h, w, c)
        return self.proj(out) + identity


class WanMidBlock(nnx.Module):
    """res -> [attn -> res] x N (wanvae.py:543-583)."""

    def __init__(self, dim: int, num_layers: int = 1, *,
                 param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        resnets = [WanResidualBlock(dim, dim, param_dtype=param_dtype,
                                    rngs=rngs)]
        attentions = []
        for _ in range(num_layers):
            attentions.append(WanAttentionBlock(dim, param_dtype=param_dtype,
                                                rngs=rngs))
            resnets.append(WanResidualBlock(dim, dim, param_dtype=param_dtype,
                                            rngs=rngs))
        self.attentions = nnx.List(attentions)
        self.resnets = nnx.List(resnets)

    def __call__(self, x: Array, ctx: "StreamCache | None" = None) -> Array:
        x = self.resnets[0](x, ctx)
        for attn, resnet in zip(self.attentions, self.resnets[1:],
                                strict=True):
            x = attn(x)
            x = resnet(x, ctx)
        return x


def _nearest_upsample2x(x: Array) -> Array:
    """2x nearest spatial upsample on [B, T, H, W, C]."""
    x = jnp.repeat(x, 2, axis=2)
    return jnp.repeat(x, 2, axis=3)


class WanResample(nnx.Module):
    """Spatial (and optionally temporal) up/down sampling (wanvae.py:254-404).

    Decoder temporal-upsample semantics: the caller splits off frame 0 and
    passes ``first_len``; frames >= first_len get the doubling time-conv with
    zero-causal padding (frame 0 excluded from the stream).
    """

    def __init__(self, dim: int, mode: str,
                 upsample_out_dim: int | None = None, *,
                 param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        self.dim = dim
        self.mode = mode
        out_dim = upsample_out_dim if upsample_out_dim is not None else dim // 2
        if mode in ("upsample2d", "upsample3d"):
            self.resample_conv = CausalConv3d(dim, out_dim, (1, 3, 3),
                                              padding=(0, 1, 1),
                                              param_dtype=param_dtype,
                                              rngs=rngs)
        elif mode in ("downsample2d", "downsample3d"):
            # torch: ZeroPad2d((0,1,0,1)) + Conv2d(3, stride 2)
            self.resample_conv = CausalConv3d(dim, dim, (1, 3, 3),
                                              stride=(1, 2, 2),
                                              param_dtype=param_dtype,
                                              rngs=rngs)
        else:
            self.resample_conv = None
        if mode == "upsample3d":
            self.time_conv = CausalConv3d(dim, dim * 2, (3, 1, 1),
                                          padding=(1, 0, 0),
                                          param_dtype=param_dtype, rngs=rngs)
        elif mode == "downsample3d":
            self.time_conv = CausalConv3d(dim, dim, (3, 1, 1),
                                          stride=(2, 1, 1),
                                          param_dtype=param_dtype, rngs=rngs)
        else:
            self.time_conv = None

    def __call__(self, x: Array, first_len: int = 1,
                 ctx: "StreamCache | None" = None) -> Array:
        b, t, h, w, c = x.shape
        if self.mode == "upsample3d":
            x0 = x[:, :first_len]
            xr = x[:, first_len:]
            if xr.shape[1] > 0:
                # doubling conv over the rest-stream, frame 0 excluded
                # (reference "Rep" branch, wanvae.py:336-372).
                xr = self.time_conv(xr, ctx=ctx)  # [B, Tr, H, W, 2C]
                tr = xr.shape[1]
                xr = xr.reshape(b, tr, h, w, 2, c)
                xr = xr.transpose(0, 1, 4, 2, 3, 5).reshape(b, tr * 2, h, w,
                                                            c)
                x = jnp.concatenate([x0, xr], axis=1)
            else:
                # keep the cache-entry ordering stable even when this chunk
                # carries only the first frame (fresh zero-context stream)
                if ctx is not None:
                    ctx.pop()
                    ctx.push(jnp.zeros((b, 2, h, w, c), x.dtype))
                x = x0
        if self.mode in ("upsample2d", "upsample3d"):
            x = _nearest_upsample2x(x)
            x = self.resample_conv(x)
        elif self.mode in ("downsample2d", "downsample3d"):
            # asymmetric zero pad (0,1,0,1): right/bottom only
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
            x = jax.lax.conv_general_dilated(
                xp, self.resample_conv.weight.value.astype(x.dtype),
                window_strides=(1, 2, 2), padding="VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            ) + self.resample_conv.bias.value.astype(x.dtype)
        if self.mode == "downsample3d" and self.time_conv is not None:
            # frame 0 passes through; stride-2 causal conv over the rest with
            # frame 0 as left context (wanvae.py:389-401).
            x0 = x[:, :first_len]
            out_r = self.time_conv(x, time_pad=0)
            x = jnp.concatenate([x0, out_r], axis=1)
        return x




def pixel_patchify(x: Array, p: int) -> Array:
    """[B,C,T,H,W] -> [B, C*p*p, T, H/p, W/p] (wanvae.py:1054, order (c,r,q))."""
    if p == 1:
        return x
    b, c, t, h, w = x.shape
    x = x.reshape(b, c, t, h // p, p, w // p, p)
    # torch rearrange "b c f (h q) (w r) -> b (c r q) f h w": channel order
    # (c, r, q) = (c, w-sub, h-sub)
    x = x.transpose(0, 1, 6, 4, 2, 3, 5)
    return x.reshape(b, c * p * p, t, h // p, w // p)


def pixel_unpatchify(x: Array, p: int) -> Array:
    if p == 1:
        return x
    b, cpp, t, h, w = x.shape
    c = cpp // (p * p)
    x = x.reshape(b, c, p, p, t, h, w)  # (c, r, q)
    x = x.transpose(0, 1, 4, 5, 3, 6, 2)  # [b, c, t, h, q, w, r]
    return x.reshape(b, c, t, h * p, w * p)


class AvgDown3D(nnx.Module):
    """Space(/time)-to-depth average-pool shortcut (wanvae.py:59-110)."""

    def __init__(self, in_channels: int, out_channels: int, factor_t: int,
                 factor_s: int = 1, *, rngs: nnx.Rngs | None = None):
        del rngs
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.factor_t = factor_t
        self.factor_s = factor_s
        self.factor = factor_t * factor_s * factor_s
        assert in_channels * self.factor % out_channels == 0
        self.group_size = in_channels * self.factor // out_channels

    def __call__(self, x: Array) -> Array:
        ft, fs = self.factor_t, self.factor_s
        b, t, h, w, c = x.shape
        pad_t = (ft - t % ft) % ft
        if pad_t:
            x = jnp.pad(x, ((0, 0), (pad_t, 0), (0, 0), (0, 0), (0, 0)))
            t += pad_t
        x = x.reshape(b, t // ft, ft, h // fs, fs, w // fs, fs, c)
        # channel-major (c, ft, sh, sw) ordering as in the torch permute
        x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
        x = x.reshape(b, t // ft, h // fs, w // fs, c * self.factor)
        x = x.reshape(*x.shape[:-1], self.out_channels, self.group_size)
        return jnp.mean(x, axis=-1)


class DupUp3D(nnx.Module):
    """Depth-to-space duplicate upsample shortcut (wanvae.py:112-156)."""

    def __init__(self, in_channels: int, out_channels: int, factor_t: int,
                 factor_s: int = 1, *, rngs: nnx.Rngs | None = None):
        del rngs
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.factor_t = factor_t
        self.factor_s = factor_s
        self.factor = factor_t * factor_s * factor_s
        assert out_channels * self.factor % in_channels == 0
        self.repeats = out_channels * self.factor // in_channels

    def __call__(self, x: Array, first_len: int = 0) -> Array:
        ft, fs = self.factor_t, self.factor_s
        b, t, h, w, c = x.shape
        x = jnp.repeat(x, self.repeats, axis=-1)
        x = x.reshape(b, t, h, w, self.out_channels, ft, fs, fs)
        x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
        x = x.reshape(b, t * ft, h * fs, w * fs, self.out_channels)
        if first_len:
            # first chunk drops the duplicated leading frames
            # (wanvae.py:151-154)
            x = x[:, ft - 1:]
        return x


class WanResidualDownBlock(nnx.Module):
    """Residual encoder block w/ AvgDown3D shortcut (wanvae.py:585-618)."""

    def __init__(self, in_dim: int, out_dim: int, num_res_blocks: int,
                 temperal_downsample: bool = False, down_flag: bool = False,
                 *, param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        self.avg_shortcut = AvgDown3D(in_dim, out_dim,
                                      factor_t=2 if temperal_downsample else 1,
                                      factor_s=2 if down_flag else 1)
        resnets = []
        cur = in_dim
        for _ in range(num_res_blocks):
            resnets.append(WanResidualBlock(cur, out_dim,
                                            param_dtype=param_dtype,
                                            rngs=rngs))
            cur = out_dim
        self.resnets = nnx.List(resnets)
        if down_flag:
            mode = "downsample3d" if temperal_downsample else "downsample2d"
            self.downsampler = WanResample(out_dim, mode,
                                           param_dtype=param_dtype, rngs=rngs)
        else:
            self.downsampler = None

    def __call__(self, x: Array, ctx: "StreamCache | None" = None) -> Array:
        shortcut = self.avg_shortcut(x)
        for resnet in self.resnets:
            x = resnet(x, ctx)
        if self.downsampler is not None:
            x = self.downsampler(x, first_len=1, ctx=ctx)
        return x + shortcut


class WanResidualUpBlock(nnx.Module):
    """Residual decoder block w/ DupUp3D shortcut (wanvae.py:760-838)."""

    def __init__(self, in_dim: int, out_dim: int, num_res_blocks: int,
                 temperal_upsample: bool = False, up_flag: bool = False, *,
                 param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        self.avg_shortcut = (DupUp3D(in_dim, out_dim,
                                     factor_t=2 if temperal_upsample else 1,
                                     factor_s=2) if up_flag else None)
        resnets = []
        cur = in_dim
        for _ in range(num_res_blocks + 1):
            resnets.append(WanResidualBlock(cur, out_dim,
                                            param_dtype=param_dtype,
                                            rngs=rngs))
            cur = out_dim
        self.resnets = nnx.List(resnets)
        if up_flag:
            mode = "upsample3d" if temperal_upsample else "upsample2d"
            self.upsampler = WanResample(out_dim, mode,
                                         upsample_out_dim=out_dim,
                                         param_dtype=param_dtype, rngs=rngs)
        else:
            self.upsampler = None

    def __call__(self, x: Array, first_len: int = 1,
                 ctx: "StreamCache | None" = None) -> Array:
        x_copy = x if self.avg_shortcut is not None else None
        for resnet in self.resnets:
            x = resnet(x, ctx)
        if self.upsampler is not None:
            x = self.upsampler(x, first_len=first_len, ctx=ctx)
        if self.avg_shortcut is not None:
            x = x + self.avg_shortcut(x_copy, first_len=first_len)
        return x


class WanUpBlock(nnx.Module):
    """(num_res+1) resblocks + optional upsampler (wanvae.py:839-903)."""

    def __init__(self, in_dim: int, out_dim: int, num_res_blocks: int,
                 upsample_mode: str | None = None, *,
                 param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        resnets = []
        current = in_dim
        for _ in range(num_res_blocks + 1):
            resnets.append(WanResidualBlock(current, out_dim,
                                            param_dtype=param_dtype,
                                            rngs=rngs))
            current = out_dim
        self.resnets = nnx.List(resnets)
        self.upsamplers = (nnx.List([
            WanResample(out_dim, upsample_mode, param_dtype=param_dtype,
                        rngs=rngs)
        ]) if upsample_mode is not None else None)

    def __call__(self, x: Array, first_len: int = 1,
                 ctx: "StreamCache | None" = None) -> Array:
        for resnet in self.resnets:
            x = resnet(x, ctx)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x, first_len=first_len, ctx=ctx)
        return x


class WanEncoder3d(nnx.Module):
    """Pixel -> latent pyramid (wanvae.py:620-758), Wan2.1 (flat) layout."""

    def __init__(self, in_channels: int, dim: int, z_dim: int,
                 dim_mult: tuple[int, ...], num_res_blocks: int,
                 attn_scales: tuple[float, ...],
                 temperal_downsample: tuple[bool, ...],
                 is_residual: bool = False, *,
                 param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        dims = [dim * u for u in [1, *dim_mult]]
        self.conv_in = CausalConv3d(in_channels, dims[0], 3, padding=1,
                                    param_dtype=param_dtype, rngs=rngs)
        blocks = []
        scale = 1.0
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:],
                                                  strict=True)):
            if is_residual:
                # Wan2.2 residual down block (wanvae.py:585-618)
                blocks.append(WanResidualDownBlock(
                    in_dim, out_dim, num_res_blocks,
                    temperal_downsample=temperal_downsample[i]
                    if i != len(dim_mult) - 1 else False,
                    down_flag=i != len(dim_mult) - 1,
                    param_dtype=param_dtype, rngs=rngs))
                continue
            for _ in range(num_res_blocks):
                blocks.append(WanResidualBlock(in_dim, out_dim,
                                               param_dtype=param_dtype,
                                               rngs=rngs))
                if scale in attn_scales:
                    blocks.append(WanAttentionBlock(out_dim,
                                                    param_dtype=param_dtype,
                                                    rngs=rngs))
                in_dim = out_dim
            if i != len(dim_mult) - 1:
                mode = ("downsample3d"
                        if temperal_downsample[i] else "downsample2d")
                blocks.append(WanResample(out_dim, mode,
                                          param_dtype=param_dtype, rngs=rngs))
                scale /= 2.0
        self.down_blocks = nnx.List(blocks)
        self.mid_block = WanMidBlock(dims[-1], param_dtype=param_dtype,
                                     rngs=rngs)
        self.norm_out = WanRMSNorm(dims[-1], param_dtype=param_dtype,
                                   rngs=rngs)
        self.conv_out = CausalConv3d(dims[-1], z_dim, 3, padding=1,
                                     param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        x = self.conv_in(x)
        for block in self.down_blocks:
            x = block(x)
        x = self.mid_block(x)
        x = jax.nn.silu(self.norm_out(x))
        return self.conv_out(x)


class WanDecoder3d(nnx.Module):
    """Latent -> pixel pyramid (wanvae.py:904-1101), Wan2.1 layout."""

    def __init__(self, dim: int, z_dim: int, dim_mult: tuple[int, ...],
                 num_res_blocks: int, attn_scales: tuple[float, ...],
                 temperal_upsample: tuple[bool, ...], out_channels: int = 3,
                 is_residual: bool = False, *,
                 param_dtype: jnp.dtype = jnp.float32, rngs: nnx.Rngs):
        dims = [dim * u for u in [dim_mult[-1], *dim_mult[::-1]]]
        self.conv_in = CausalConv3d(z_dim, dims[0], 3, padding=1,
                                    param_dtype=param_dtype, rngs=rngs)
        self.mid_block = WanMidBlock(dims[0], param_dtype=param_dtype,
                                     rngs=rngs)
        up_blocks = []
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:],
                                                  strict=True)):
            if i > 0 and not is_residual:
                in_dim = in_dim // 2
            up_flag = i != len(dim_mult) - 1
            if is_residual:
                up_blocks.append(WanResidualUpBlock(
                    in_dim, out_dim, num_res_blocks,
                    temperal_upsample=temperal_upsample[i]
                    if up_flag else False,
                    up_flag=up_flag, param_dtype=param_dtype, rngs=rngs))
                continue
            upsample_mode = None
            if up_flag and temperal_upsample[i]:
                upsample_mode = "upsample3d"
            elif up_flag:
                upsample_mode = "upsample2d"
            up_blocks.append(WanUpBlock(in_dim, out_dim, num_res_blocks,
                                        upsample_mode,
                                        param_dtype=param_dtype, rngs=rngs))
        self.up_blocks = nnx.List(up_blocks)
        self.norm_out = WanRMSNorm(dims[-1], param_dtype=param_dtype,
                                   rngs=rngs)
        self.conv_out = CausalConv3d(dims[-1], out_channels, 3, padding=1,
                                     param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: Array, first_len: int = 1,
                 ctx: "StreamCache | None" = None) -> Array:
        x = self.conv_in(x, ctx=ctx)
        x = self.mid_block(x, ctx)
        for block in self.up_blocks:
            x = block(x, first_len=first_len, ctx=ctx)
        x = jax.nn.silu(self.norm_out(x))
        return self.conv_out(x, ctx=ctx)


class DiagonalGaussianDistribution:
    """mean/logvar split of the encoder output."""

    def __init__(self, parameters: Array):
        self.parameters = parameters
        self.mean, self.logvar = jnp.split(parameters, 2, axis=-1)
        self.logvar = jnp.clip(self.logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, key: jax.Array) -> Array:
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, self.mean.dtype)

    def mode(self) -> Array:
        return self.mean


class AutoencoderKLWan(nnx.Module):
    """Wan 3D causal VAE (wanvae.py:1103-1379). API boundary is NCDHW."""

    def __init__(self, config: WanVAEArchConfig, load_encoder: bool = True,
                 load_decoder: bool = True, *,
                 param_dtype: jnp.dtype = jnp.float32,
                 rngs: nnx.Rngs | None = None):
        rngs = rngs or nnx.Rngs(0)
        self.config = config
        self.z_dim = config.z_dim
        temperal_upsample = tuple(config.temperal_downsample[::-1])
        decoder_base_dim = config.decoder_base_dim or config.base_dim
        # NOTE: with patch_size, HF configs already carry the patchified
        # channel counts (in/out = 3 * p^2).
        if load_encoder:
            self.encoder = WanEncoder3d(
                config.in_channels, config.base_dim, config.z_dim * 2,
                config.dim_mult, config.num_res_blocks, config.attn_scales,
                config.temperal_downsample, config.is_residual,
                param_dtype=param_dtype, rngs=rngs)
        else:
            self.encoder = None
        self.quant_conv = CausalConv3d(config.z_dim * 2, config.z_dim * 2, 1,
                                       param_dtype=param_dtype, rngs=rngs)
        self.post_quant_conv = CausalConv3d(config.z_dim, config.z_dim, 1,
                                            param_dtype=param_dtype,
                                            rngs=rngs)
        dec_out = config.out_channels
        if load_decoder:
            self.decoder = WanDecoder3d(
                decoder_base_dim, config.z_dim, config.dim_mult,
                config.num_res_blocks, config.attn_scales, temperal_upsample,
                dec_out, config.is_residual, param_dtype=param_dtype,
                rngs=rngs)
        else:
            self.decoder = None

    # -- latent normalization (configs latents_mean/std) -------------------

    def normalize_latents(self, latents: Array) -> Array:
        mean = jnp.asarray(self.config.latents_mean_arr())[None, :, None,
                                                           None, None]
        std = jnp.asarray(self.config.latents_std_arr())[None, :, None, None,
                                                         None]
        return (latents - mean) / std

    def denormalize_latents(self, latents: Array) -> Array:
        mean = jnp.asarray(self.config.latents_mean_arr())[None, :, None,
                                                           None, None]
        std = jnp.asarray(self.config.latents_std_arr())[None, :, None, None,
                                                         None]
        return latents.astype(jnp.float32) * std + mean

    # -- encode / decode ---------------------------------------------------

    def encode(self, x: Array) -> DiagonalGaussianDistribution:
        """x: [B, C, T, H, W] pixels in [-1, 1] -> latent distribution."""
        assert self.encoder is not None
        if self.config.patch_size:
            x = pixel_patchify(x, self.config.patch_size)
        x = x.transpose(0, 2, 3, 4, 1)  # NDHWC
        out = self.encoder(x)
        enc = self.quant_conv(out)
        return DiagonalGaussianDistribution(enc)

    def encode_latents(self, x: Array, key: jax.Array | None = None) -> Array:
        dist = self.encode(x)
        z = dist.sample(key) if key is not None else dist.mode()
        return z.transpose(0, 4, 1, 2, 3)  # back to NCDHW

    def decode(self, z: Array, *, chunk_frames: int | None = None) -> Array:
        """z: [B, C, T, H, W] (denormalized) -> pixels [B, 3, T', H', W'].

        ``chunk_frames``: latent frames per decode chunk. When set (or when
        the clip is large enough to auto-chunk), the decoder runs as a
        ``lax.scan`` over chunks with carried conv caches — bit-identical to
        the full-clip path but with bounded HBM (the reference achieves the
        same with python-side per-frame streaming, wanvae.py:1254-1272).
        """
        assert self.decoder is not None
        z = z.transpose(0, 2, 3, 4, 1)  # NDHWC
        x = self.post_quant_conv(z)
        if chunk_frames is None:
            # auto-chunk when the full-res activations would exceed ~2 GB
            b, t, h, w, _ = x.shape
            full_elems = b * t * 4 * h * 8 * w * 8 * 96
            if full_elems > 7e8 and t > 2:
                chunk_frames = max(1, int(7e8 / (full_elems / t)))
        if chunk_frames is not None and x.shape[1] > max(chunk_frames, 1):
            out = self._decode_chunked(x, max(chunk_frames, 1))
        else:
            out = self.decoder(x)
        out = out.astype(jnp.float32)
        out = out.transpose(0, 4, 1, 2, 3)
        if self.config.patch_size:
            out = pixel_unpatchify(out, self.config.patch_size)
        if self.config.clip_output:
            out = jnp.clip(out, -1.0, 1.0)
        return out

    def decode_dispatched(self, z: Array, *, denormalize: bool = False,
                          chunk_frames: int | None = None,
                          decode_dtype=jnp.bfloat16) -> Array:
        """Chunked decode as SEPARATE dispatches (one jitted program per
        chunk) with the conv caches DONATED between them.

        Bit-identical to ``decode()``'s lax.scan path, but HBM peak is one
        chunk's working set: the scan double-buffers its carry (the conv
        caches) and keeps the stacked per-chunk outputs alive inside one
        program, which pushes the 81-frame 480p decode past what fits next
        to a resident 1.3B DiT. Costs one ~27 ms dispatch per chunk.
        Must be called OUTSIDE jit (it drives the dispatch loop in python).
        """
        assert self.decoder is not None
        if chunk_frames is None:
            # Full-res working-set budget per chunk, leaving room for a
            # co-resident DiT (2.6 GB at 1.3B bf16). The Pallas conv path
            # keeps only its in/out buffers live, so it fits chunk=4 next
            # to that DiT (measured round 4: 4.18s warm, no OOM); the XLA
            # tap decomposition materializes per-tap partials and OOMs
            # past chunk=2 (measured round 3).
            b, _, t, h, w = z.shape
            full_elems = b * t * 4 * h * 8 * w * 8 * 96
            # 3.5e8 -> chunk=2 at 480p. Wider chunks measured round 4:
            # chunk=4 fits next to a bare 2.6 GB DiT ballast (4.18s) but
            # OOMs in the real session; chunk=3 survives one generation
            # then OOMs on the second (DiT + text encoder + prior outputs
            # resident). chunk=2 is the stable point on 16 GB.
            chunk_frames = (max(1, int(3.5e8 / (full_elems / t)))
                            if full_elems > 3.5e8 and t > 2 else t)
        if not hasattr(self, "_disp"):
            graphdef, st = nnx.split(self)

            @functools.partial(jax.jit,
                               static_argnames=("first", "denorm", "dtype"))
            def first_fn(st, zc, first, denorm, dtype):
                m = nnx.merge(graphdef, st)
                if denorm:
                    zc = m.denormalize_latents_nchw_last(zc)
                x = m.post_quant_conv(zc.astype(dtype))
                ctx = StreamCache(None)
                out = m.decoder(x, first_len=int(first), ctx=ctx)
                return m._finish_chunk(out), ctx.out

            @functools.partial(jax.jit, donate_argnums=(2,),
                               static_argnames=("denorm", "dtype"))
            def next_fn(st, zc, cache, denorm, dtype):
                m = nnx.merge(graphdef, st)
                if denorm:
                    zc = m.denormalize_latents_nchw_last(zc)
                x = m.post_quant_conv(zc.astype(dtype))
                ctx = StreamCache(cache)
                out = m.decoder(x, first_len=0, ctx=ctx)
                return m._finish_chunk(out), ctx.out

            self._disp = (first_fn, next_fn, st)
        first_fn, next_fn, st = self._disp

        def _settle(x: Array) -> None:
            # Bound in-flight chunks: async dispatch of the whole loop
            # would allocate EVERY chunk's conv caches (~1.5 GB per
            # generation) simultaneously and OOM. On this platform
            # block_until_ready() is an async no-op, so settle with a
            # 1-element host fetch.
            jax.device_get(x[:1, :1, :1, :1, :1])

        z = z.transpose(0, 2, 3, 4, 1)  # NDHWC
        t = z.shape[1]
        # Lag-1 settling: dispatch chunk i+1 BEFORE settling chunk i, so
        # the settle fetch + next-dispatch round-trips overlap chunk i's
        # compute. Measured neutral on this rig (81f/480p resident:
        # 3.68 s vs 3.69 s serial — the axon tunnel already pipelines the
        # enqueue), kept because it removes ~2 host RTTs per chunk on
        # genuinely high-latency links while keeping at most 2 chunks'
        # working sets live (all-async was the OOM).
        outs = []
        prev = None
        out0, cache = first_fn(st, z[:, :1], True, denormalize,
                               decode_dtype)
        outs.append(out0)
        prev = out0
        pos = 1
        while pos < t:
            end = min(pos + chunk_frames, t)
            o, cache = next_fn(st, z[:, pos:end], cache, denormalize,
                               decode_dtype)
            outs.append(o)
            _settle(prev)
            prev = o
            pos = end
        # the final chunk settles in the consumer (concatenate/fetch)
        out = jnp.concatenate(outs, axis=2)
        if self.config.patch_size:
            out = pixel_unpatchify(out, self.config.patch_size)
        return out

    def denormalize_latents_nchw_last(self, z: Array) -> Array:
        """``denormalize_latents`` for NDHWC layout (channels last)."""
        mean = jnp.asarray(self.config.latents_mean_arr())
        std = jnp.asarray(self.config.latents_std_arr())
        return z.astype(jnp.float32) * std + mean

    def _finish_chunk(self, out: Array) -> Array:
        """Per-chunk epilogue of ``decode()``: f32 cast, NCDHW, clip."""
        out = out.astype(jnp.float32).transpose(0, 4, 1, 2, 3)
        if self.config.clip_output:
            out = jnp.clip(out, -1.0, 1.0)
        return out

    def _decode_chunked(self, x: Array, chunk: int) -> Array:
        dec = self.decoder
        b = x.shape[0]
        ctx0 = StreamCache(None)
        out0 = dec(x[:, :1], first_len=1, ctx=ctx0)
        cache = ctx0.out
        rest = x[:, 1:]
        n_rest = rest.shape[1]
        outs = [out0]
        n_full, rem = divmod(n_rest, chunk)
        if n_full:
            zc = rest[:, :n_full * chunk]
            zc = zc.reshape(b, n_full, chunk,
                            *rest.shape[2:]).transpose(1, 0, 2, 3, 4, 5)

            def body(cache, z_chunk):
                ctx = StreamCache(cache)
                out = dec(z_chunk, first_len=0, ctx=ctx)
                return ctx.out, out

            cache, stacked = jax.lax.scan(body, cache, zc)
            # [n_full, B, chunk*up, H, W, C] -> [B, n_full*chunk*up, ...]
            o = stacked.transpose(1, 0, 2, 3, 4, 5)
            outs.append(o.reshape(b, -1, *stacked.shape[3:]))
        if rem:
            ctx = StreamCache(cache)
            outs.append(dec(rest[:, n_full * chunk:], first_len=0, ctx=ctx))
            cache = ctx.out
        return jnp.concatenate(outs, axis=1)


    # -- tiled / parallel decode -------------------------------------------

    def spatial_tiled_decode(self, z: Array, *,
                             tile_latent_min: tuple[int, int] = (32, 32),
                             tile_latent_stride: tuple[int, int] = (24, 24),
                             shard_tiles: bool = False) -> Array:
        """Overlapping spatial tiles, decoded as ONE batched program and
        crossfade-blended (reference ParallelTiledVAE.spatial_tiled_decode +
        blend_h/v, common.py:99-175).

        TPU twist: tiles are stacked on the batch dim; with
        ``shard_tiles=True`` that dim is sharded over the dp x sp mesh so
        every chip decodes a subset — the analog of the reference's
        SP-distributed parallel_tiled_decode (common.py:174-311) without
        gather-side metadata plumbing.
        """
        b, c, t, lh, lw = z.shape
        th, tw = tile_latent_min
        sh, sw = tile_latent_stride
        if lh <= th and lw <= tw:
            return self.decode(z)
        n_h = max(1, -(-(lh - th) // sh) + 1)
        n_w = max(1, -(-(lw - tw) // sw) + 1)
        pad_h = (n_h - 1) * sh + th - lh
        pad_w = (n_w - 1) * sw + tw - lw
        zp = jnp.pad(z, ((0, 0), (0, 0), (0, 0), (0, pad_h), (0, pad_w)),
                     mode="edge")

        tiles = [
            zp[:, :, :, i * sh:i * sh + th, j * sw:j * sw + tw]
            for i in range(n_h) for j in range(n_w)
        ]
        stacked = jnp.concatenate(tiles, axis=0)  # [n_tiles*B, ...]
        if shard_tiles:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from fastvideo_tpu.parallel.mesh import get_mesh

            mesh = get_mesh()
            n_dev = mesh.devices.size
            n_total = stacked.shape[0]
            pad_tiles = (-n_total) % n_dev
            if pad_tiles:
                stacked = jnp.concatenate(
                    [stacked, stacked[:pad_tiles]], axis=0)
            stacked = jax.device_put(
                stacked, NamedSharding(mesh, P(mesh.axis_names)))
        dec = self.decode(stacked)
        if shard_tiles and pad_tiles:
            dec = dec[:n_h * n_w * b]
        sr = self.config.spatial_compression_ratio
        if self.config.patch_size:
            sr *= self.config.patch_size
        dec_tiles = [
            dec[k * b:(k + 1) * b] for k in range(n_h * n_w)
        ]

        # crossfade blend (vectorized linear ramps)
        blend_h_ext = (th - sh) * sr
        blend_w_ext = (tw - sw) * sr
        stride_h_px = sh * sr
        stride_w_px = sw * sr

        def blend(a: Array, bb: Array, ext: int, axis: int) -> Array:
            ext = min(ext, a.shape[axis], bb.shape[axis])
            if ext <= 0:
                return bb
            ramp = jnp.arange(ext, dtype=jnp.float32) / ext
            shape = [1] * a.ndim
            shape[axis] = ext
            ramp = ramp.reshape(shape)
            a_tail = jax.lax.slice_in_dim(a, a.shape[axis] - ext,
                                          a.shape[axis], axis=axis)
            b_head = jax.lax.slice_in_dim(bb, 0, ext, axis=axis)
            mixed = a_tail * (1 - ramp) + b_head * ramp
            rest = jax.lax.slice_in_dim(bb, ext, bb.shape[axis], axis=axis)
            return jnp.concatenate([mixed, rest], axis=axis)

        rows = []
        for i in range(n_h):
            row = None
            for j in range(n_w):
                tile = dec_tiles[i * n_w + j]
                if row is None:
                    row = tile
                else:
                    blended = blend(prev_tile, tile, blend_w_ext, 4)
                    row = jnp.concatenate(
                        [row[..., :j * stride_w_px], blended], axis=4)
                prev_tile = tile
            rows.append(row)
        out = None
        for i, row in enumerate(rows):
            if out is None:
                out = row
            else:
                blended = blend(prev_row, row, blend_h_ext, 3)
                out = jnp.concatenate(
                    [out[:, :, :, :i * stride_h_px], blended], axis=3)
            prev_row = row
        return out[:, :, :, :lh * sr, :lw * sr]

    def parallel_tiled_decode(self, z: Array, **kwargs) -> Array:
        """Spatially tiled decode with tiles sharded across the mesh
        (reference common.py:174)."""
        return self.spatial_tiled_decode(z, shard_tiles=True, **kwargs)

    def streaming_decode(
        self, z: Array, cache: list[Array] | None,
        is_first_chunk: bool = False
    ) -> tuple[Array, list[Array]]:
        """Causal streaming decode: one chunk in, (pixels, new cache) out.

        Runs as ONE jitted program per chunk with the conv cache DONATED
        (same pattern as decode_dispatched): eager op-by-op dispatch keeps
        every decoder intermediate alive with no XLA liveness analysis,
        which OOMs a 16 GB chip when the stream runs beside a 1.3B DiT and
        its ~6 GB rolling KV (measured: the realtime bench died in
        conv_out at full res before this was jitted).

        Reference analog: AutoencoderKLWan.streaming_decode
        (wanvae.py:1326-1358) for realtime/self-forcing pipelines.
        """
        assert self.decoder is not None
        if not hasattr(self, "_stream_disp"):
            graphdef, st = nnx.split(self)

            @functools.partial(jax.jit, static_argnames=("first",))
            def s_first(st, zc, first):
                m = nnx.merge(graphdef, st)
                ctx = StreamCache(None)
                out = m._streaming_decode_body(zc, ctx, first)
                return out, ctx.out

            @jax.jit
            def s_next(st, zc, cache):
                # NOTE: the cache is NOT donate_argnums-donated here — the
                # streaming generator alternates decode chunks with DiT
                # block steps, and the caller may still hold the old list;
                # entries are small (2 frames per conv). Donation stays on
                # the KV side where the buffers are GBs.
                m = nnx.merge(graphdef, st)
                ctx = StreamCache(cache)
                out = m._streaming_decode_body(zc, ctx, 0)
                return out, ctx.out

            self._stream_disp = (s_first, s_next, st)
        s_first, s_next, st = self._stream_disp
        if cache is None:
            return s_first(st, z, 1 if is_first_chunk else 0)
        return s_next(st, z, cache)

    def _streaming_decode_body(self, z: Array, ctx: "StreamCache",
                               first_len: int) -> Array:
        z = z.transpose(0, 2, 3, 4, 1)
        x = self.post_quant_conv(z)
        out = self.decoder(x, first_len=first_len, ctx=ctx)
        out = out.astype(jnp.float32)
        if self.config.clip_output:
            out = jnp.clip(out, -1.0, 1.0)
        return out.transpose(0, 4, 1, 2, 3)


EntryClass = AutoencoderKLWan
