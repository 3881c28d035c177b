"""Pallas TPU kernel: 3D convolution for the causal-VAE hot path.

Round-4 on-chip status (v5e, scripts/exp_conv_strategies.py +
exp_conv_probe2.py + exp_conv_kfold.py, in-jit anti-CSE repeats): "kf"
(transposed orientation with the (dt, dh) taps K-folded into the
contraction dim via a free reshape view) is the production mode — 105-112
TF/s at the decoder's 96-ch full-res stage, 107-108 at 192 ch, ~103 at
384 ch; full 81f/480p decode 3.69 s resident (tap: 4.4, thcw: 4.1, XLA
conv: 4.7 with a 495 s cold compile vs Pallas ~25 s). The ladder that got
here: "tap" (27 K=C dots, 61-70 TF/s — relayout-taxed), "thcw" (transposed
so the wide W axis rides the MXU's N lanes, 87-94), "kf" (+96.4% K fill,
9x fewer accumulator adds). A wrong-math aligned-rows ceiling probe
matches kf, i.e. the remaining ~45% gap to peak is the dot geometry
itself (M=Co stream length at these channel counts), not data movement.
"nb" compiles but loses to tap. "dma", "dw", "dhw", and "shift3" all fail
Mosaic on-chip — any BlockSpec Element offset that is nonzero on the
sublane (width) dim is rejected by this libtpu (bisected in round 4);
they remain for interpret mode and for when Mosaic lifts the restriction.
"tfold" (temporal K-fold via an XLA-side concat) loses on-chip — 38.9 vs
59.5 TF/s at 96 ch — the 3x input materialization costs more than the
fuller MXU rows recover; "kf" gets the same fill for free in-kernel.
Winograd F(2x2,3x3) at the XLA level is also measured-rejected (17-39
TF/s effective; ops/winograd.py).

Reference behavior analog: the causal Conv3d modules of
/root/reference/fastvideo/models/vaes/wanvae.py:157-206 (math only; the
blocking/fusion strategy here is TPU-specific).

Optionally fuses the preceding RMSNorm+SiLU (the WanResidualBlock prologue)
into the same kernel, saving a full HBM round-trip per conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:  # element-offset block indexing (overlapping windows)
    from jax.experimental.pallas import Element  # type: ignore
except ImportError:  # pragma: no cover - version-dependent export
    from jax._src.pallas.core import Element  # type: ignore

Array = jax.Array


def _use_interpret() -> bool:
    # Pallas TPU kernels run in interpreter mode on CPU (tests).
    return jax.default_backend() == "cpu"


def _conv_kernel(x_ref, w_ref, b_ref, o_ref, *, kt: int, bh: int, w_out: int,
                 fuse_rms_silu: bool, gamma_ref=None, mode: str = "tap",
                 accw_ref=None):
    """One (t, h-tile) output block: KT*3*3 tap matmuls from VMEM.

    x_ref: [kt, bh+2, w_out+2, C] overlapping input window
    w_ref: [kt, 3, 3, C, Co]; b_ref: [1, Co]; o_ref: [1, bh, w_out, Co]

    mode: how taps map onto MXU contractions
      - "tap":   kt*9 matmuls with K=C
      - "nb":    kt*3 matmuls with K=C, N=3*round_up(Co,128): the three dw
                 taps ride the N dimension of one dot (each padded to a lane
                 tile so the epilogue slices are 128-aligned), and the W
                 shift-add happens once on the fp32 accumulator. Fewer,
                 wider dots than "tap" for the same MXU ceiling.
      - "dw":    kt*3 matmuls with K=3C (dw folded via channel concat)
      - "dhw":   kt matmuls with K=9C
      - "full":  1 matmul with K=kt*9*C
    """
    c = x_ref.shape[-1]
    co = o_ref.shape[-1]
    x = x_ref[...]
    if fuse_rms_silu:
        xf = x.astype(jnp.float32)
        sq = jnp.sum(jnp.square(xf), axis=-1, keepdims=True)
        inv = (c**0.5) * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))
        xn = (xf * inv * gamma_ref[...].astype(jnp.float32)).astype(x.dtype)
        x = xn * jax.nn.sigmoid(xn.astype(jnp.float32)).astype(x.dtype)
    if mode == "nb":
        # w_ref: [kt, 3, C, 3*co_pad] with block dw at cols
        # [dw*co_pad, dw*co_pad+co) and zero elsewhere. The fp32 N-batched
        # accumulator lives in an explicit VMEM scratch (acc_ref) — as an
        # SSA value it lands on Mosaic's stack and blows the scoped-vmem
        # limit at decoder shapes.
        wp = x.shape[2]  # w_out + 2
        co_pad = w_ref.shape[-1] // 3
        first = True
        for dt in range(kt):
            for dh in range(3):
                xs = x[dt, dh:dh + bh].reshape(bh * wp, c)
                d = jnp.dot(xs, w_ref[dt, dh],
                            preferred_element_type=jnp.float32)
                if first:
                    accw_ref[...] = d
                    first = False
                else:
                    accw_ref[...] += d
        y = accw_ref[...].reshape(bh, wp, 3 * co_pad)
        acc = (y[:, 0:w_out, 0:co] +
               y[:, 1:w_out + 1, co_pad:co_pad + co] +
               y[:, 2:w_out + 2, 2 * co_pad:2 * co_pad + co])
        acc = acc + b_ref[0].astype(jnp.float32)
        o_ref[0] = acc.astype(o_ref.dtype)
        return
    rows = bh * w_out
    acc = jnp.zeros((rows, co), jnp.float32)
    if mode == "tap":
        for dt in range(kt):
            for dh in range(3):
                for dw in range(3):
                    xs = x[dt, dh:dh + bh, dw:dw + w_out, :]
                    xs = xs.reshape(rows, c)
                    acc = acc + jnp.dot(xs, w_ref[dt, dh, dw],
                                        preferred_element_type=jnp.float32)
    elif mode == "dw":
        for dt in range(kt):
            for dh in range(3):
                xs = jnp.concatenate(
                    [x[dt, dh:dh + bh, dw:dw + w_out, :] for dw in range(3)],
                    axis=-1).reshape(rows, 3 * c)
                wr = w_ref[dt, dh].reshape(3 * c, co)
                acc = acc + jnp.dot(xs, wr,
                                    preferred_element_type=jnp.float32)
    elif mode == "dhw":
        for dt in range(kt):
            xs = jnp.concatenate([
                x[dt, dh:dh + bh, dw:dw + w_out, :]
                for dh in range(3) for dw in range(3)
            ], axis=-1).reshape(rows, 9 * c)
            wr = w_ref[dt].reshape(9 * c, co)
            acc = acc + jnp.dot(xs, wr, preferred_element_type=jnp.float32)
    else:  # full
        xs = jnp.concatenate([
            x[dt, dh:dh + bh, dw:dw + w_out, :]
            for dt in range(kt) for dh in range(3) for dw in range(3)
        ], axis=-1).reshape(rows, kt * 9 * c)
        wr = w_ref[...].reshape(kt * 9 * c, co)
        acc = acc + jnp.dot(xs, wr, preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = acc.reshape(bh, w_out, co).astype(o_ref.dtype)


def _conv_kernel_hoist(x_ref, w_ref, b_ref, o_ref, *, kt: int, bh: int,
                       w_out: int, fuse_rms_silu: bool, gamma_ref=None):
    """tap's math with the width shifts HOISTED out of the tap loop.

    tap pays a misaligned-sublane relayout on every (dt, dh, dw!=aligned)
    slice — 18 of 27 slabs per block. Here each dw produces ONE shifted
    copy of the whole [kt, bh+2, w_out, C] window (2 misaligned copies per
    block instead of 18 slab relayouts); the dt/dh tap slices on the copy
    ride major dims, which are free. dw is the OUTER loop so only one
    shifted copy is live at a time (Mosaic stack stays small).
    """
    c = x_ref.shape[-1]
    co = o_ref.shape[-1]
    x = x_ref[...]
    if fuse_rms_silu:
        xf = x.astype(jnp.float32)
        sq = jnp.sum(jnp.square(xf), axis=-1, keepdims=True)
        inv = (c**0.5) * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))
        xn = (xf * inv * gamma_ref[...].astype(jnp.float32)).astype(x.dtype)
        x = xn * jax.nn.sigmoid(xn.astype(jnp.float32)).astype(x.dtype)
    rows = bh * w_out
    acc = jnp.zeros((rows, co), jnp.float32)
    for dw in range(3):
        xd = x[:, :, dw:dw + w_out, :]  # one sublane shift per dw
        for dt in range(kt):
            for dh in range(3):
                xs = xd[dt, dh:dh + bh].reshape(rows, c)  # major-dim slice
                acc = acc + jnp.dot(xs, w_ref[dt, dh, dw],
                                    preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = acc.reshape(bh, w_out, co).astype(o_ref.dtype)


def _conv_kernel_thcw_kf(x_ref, w_ref, b_ref, o_ref, *, kt: int, bh: int,
                         w_out: int):
    """thcw with the (dt, dh) taps K-FOLDED into the contraction dim.

    In the thcw layout [kt, bh+2, C, wp] the (dt, dh, C) row stack that one
    output row needs is the contiguous RESHAPE VIEW x[:, h:h+3] -> [kt*3*C,
    wp]: C is sublane-tile aligned (C % 16 == 0 in bf16) so the merge costs
    nothing, turning the row into 3 dots (dw only) of [Co, kt*3*C] @
    [kt*3*C, W]. K = 864 at the 96-ch stage pads to 896 (96.4% MXU
    contraction fill vs thcw's 96->128 = 75%) and there are 9x fewer fp32
    accumulator adds. Measured (scripts/exp_conv_kfold.py, v5e): 105-112
    TF/s @96 ch (thcw: 89-92), 107-108 @192 (thcw: 82-87), 95-103 @384
    (thcw: 95-100). A wrong-math aligned-rows ceiling probe lands at the
    same 105-110, i.e. the view/fold is free and the dot geometry itself is
    what remains. Stacking the dw blocks on M (one [3Co, K] dot) measured
    the same; M is not the wall.

    w_ref: [3(dw), Co, kt*3*C] with rows ordered (dt, dh, C);
    b_ref: [Co, 1]; o_ref: [1, bh, Co, w_out].
    """
    c = x_ref.shape[2]
    co = o_ref.shape[2]
    wp = x_ref.shape[-1]
    x = x_ref[...]
    for h in range(bh):
        xc = x[:, h:h + 3].reshape(kt * 3 * c, wp)
        acc = jnp.zeros((co, w_out), jnp.float32)
        for dw in range(3):
            acc = acc + jnp.dot(w_ref[dw], xc[:, dw:dw + w_out],
                                preferred_element_type=jnp.float32)
        acc = acc + b_ref[...].astype(jnp.float32)
        o_ref[0, h] = acc.astype(o_ref.dtype)


def _conv_kernel_thcw_kf_int8(x_ref, w_ref, b_ref, s_ref, o_ref, *, kt: int,
                              bh: int, w_out: int):
    """W8A8 variant of the kf kernel: int8 x/w, int32 MXU accumulation,
    fp32 dequant epilogue (per-Co scale = weight_scale * activation_scale).

    The MXU runs int8 at 2x the bf16 rate; the bf16 kf kernel is geometry-
    bound at ~55% of peak, and the int8 form keeps a measured 1.44-1.54x of
    it at the decoder's hot shapes (scripts/exp_conv_int8.py, in-jit
    anti-CSE repeats: 131/127 TOPS eff @96/192 ch vs bf16 kf's 85/88 TF/s).

    w_ref: int8 [3(dw), Co, kt*3*C]; b_ref/s_ref: fp32 [Co, 1];
    x_ref: int8 [kt, bh+2, C, wp]; o_ref: [1, bh, Co, w_out].
    """
    c = x_ref.shape[2]
    co = o_ref.shape[2]
    x = x_ref[...]
    for h in range(bh):
        xc = x[:, h:h + 3].reshape(kt * 3 * c, x_ref.shape[-1])
        acc = jnp.zeros((co, w_out), jnp.int32)
        for dw in range(3):
            acc = acc + jax.lax.dot_general(
                w_ref[dw], xc[:, dw:dw + w_out],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * s_ref[...] + b_ref[...]
        o_ref[0, h] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kt", "out_dtype",
                                             "bh_override"))
def _conv3d_pallas_thcw_int8(xq: Array, wq: Array, b: Array, scale: Array, *,
                             kt: int, out_dtype,
                             bh_override: int | None = None) -> Array:
    """int8 K-folded transposed conv. xq: int8 [T_out+kt-1, H+2, C, W_out+2]
    pre-padded; wq: int8 [3, Co, kt*3*C]; b/scale: fp32 [Co]."""
    tp, hp, c, wp = xq.shape
    t_out, h, w_out = tp - kt + 1, hp - 2, wp - 2
    co = wq.shape[1]
    bh = bh_override or _pick_bh(h, w_out, c, kt, "kf", co, itemsize=1)
    grid = (t_out, h // bh)

    flops = 2 * t_out * h * w_out * c * co * kt * 9
    return pl.pallas_call(
        functools.partial(_conv_kernel_thcw_kf_int8, kt=kt, bh=bh,
                          w_out=w_out),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (Element(kt), Element(bh + 2), Element(c), Element(wp)),
                lambda t, i: (t, i * bh, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, co, w_out),
                               lambda t, i: (t, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_out, h, co, w_out), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=xq.size * 2, transcendentals=0),
        interpret=_use_interpret(),
    )(xq, wq, b.astype(jnp.float32).reshape(co, 1),
      scale.astype(jnp.float32).reshape(co, 1))


def _quantize_int8(x: Array, axes) -> tuple[Array, Array]:
    """Symmetric per-slice int8: returns (q, scale) with x ~= q * scale."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127,
                 127).astype(jnp.int8)
    return q, s


def _conv_kernel_thcw(x_ref, w_ref, b_ref, o_ref, *, kt: int, bh: int,
                      w_out: int):
    """Transposed-orientation taps: out^T[Co, W] = W[Co, C] @ x^T[C, W].

    Round-4 probe result (scripts/exp_conv_probe2.py): the tap form's wall
    is NOT relayouts or K fill — it is the OUTPUT N dim. With Co=96 on
    lanes every dot pads N 96->128 and streams only 96 lanes; flipping the
    orientation puts the W axis (832 at the decoder's full-res stage) on N
    and the small Co on the streamed M dim, which the MXU doesn't pad.
    Measured at the decoder stages: 94 TF/s @96 ch (tap: 66), 92 @192
    (tap: 70); tap stays ahead at 384 ch / W=208 (110 vs 100 — short N
    streams can't amortize MXU weight reloads there).

    Layout: x_ref [kt, bh+2, C, wp] — C on sublanes, W on lanes, so the
    dt/dh tap shifts ride major dims (free views) and only the three dw
    shifts are lane slices (measured free). w_ref: [kt, 3, 3, Co, C];
    b_ref: [Co, 1]; o_ref: [1, bh, Co, w_out].
    """
    co = o_ref.shape[2]
    x = x_ref[...]
    for h in range(bh):
        acc = jnp.zeros((co, w_out), jnp.float32)
        for dt in range(kt):
            for dh in range(3):
                for dw in range(3):
                    xs = x[dt, h + dh, :, dw:dw + w_out]
                    acc = acc + jnp.dot(w_ref[dt, dh, dw], xs,
                                        preferred_element_type=jnp.float32)
        acc = acc + b_ref[...].astype(jnp.float32)
        o_ref[0, h] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kt", "out_dtype",
                                             "bh_override", "fold"))
def _conv3d_pallas_thcw(x: Array, w: Array, b: Array, *, kt: int, out_dtype,
                        bh_override: int | None = None,
                        fold: bool = False) -> Array:
    """x: [T_out+kt-1, H+2, C, W_out+2] pre-padded.

    w: [kt,3,3,Co,C] (fold=False) or [3, Co, kt*3*C] (fold=True).
    """
    tp, hp, c, wp = x.shape
    t_out, h, w_out = tp - kt + 1, hp - 2, wp - 2
    co = w.shape[-2] if not fold else w.shape[1]
    bh = bh_override or _pick_bh(h, w_out, c, kt, "kf" if fold else "thcw",
                                 co, itemsize=x.dtype.itemsize)
    grid = (t_out, h // bh)

    def kernel(x_ref, w_ref, b_ref, o_ref):
        if fold:
            _conv_kernel_thcw_kf(x_ref, w_ref, b_ref, o_ref, kt=kt, bh=bh,
                                 w_out=w_out)
        else:
            _conv_kernel_thcw(x_ref, w_ref, b_ref, o_ref, kt=kt, bh=bh,
                              w_out=w_out)

    flops = 2 * t_out * h * w_out * c * co * kt * 9
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (Element(kt), Element(bh + 2), Element(c), Element(wp)),
                lambda t, i: (t, i * bh, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, co, w_out),
                               lambda t, i: (t, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_out, h, co, w_out), out_dtype),
        # the default 16 MB scoped-vmem limit rejects the 192-ch decoder
        # stage even though the working set is ~8 MB (Mosaic pipelining
        # headroom); measured fine at 96 MB on v5e
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0),
        interpret=_use_interpret(),
    )(x, w, b.reshape(co, 1))


def _conv_kernel_dma(x_ref, w_ref, b_ref, o_ref, acc_ref, *, kt: int,
                     bh: int, w_out: int, fuse_rms_silu: bool,
                     gamma_ref=None):
    """One (t, h-tile, dw) grid step: kt*3 clean [rows,C]@[C,Co] dots.

    The dw (width) shift of the 3x3 window rides the input BlockSpec's
    Element offset, so the misaligned sublane slice is done by the DMA
    engine during the HBM->VMEM fetch instead of as an in-kernel VPU
    relayout (the relayouts cost as much as the matmuls in "tap" mode —
    measured 37 TF/s vs this form's clean dot stream). The fp32
    accumulator persists in VMEM scratch across the 3 dw steps of one
    output block; the block writes out on the last step.
    """
    dw = pl.program_id(2)
    c = x_ref.shape[-1]
    co = o_ref.shape[-1]
    x = x_ref[...]
    if fuse_rms_silu:
        # silu(rmsnorm(0)) == 0, so norm-then-pad == pad-then-norm and the
        # fusion stays exact on zero-padded borders.
        xf = x.astype(jnp.float32)
        sq = jnp.sum(jnp.square(xf), axis=-1, keepdims=True)
        inv = (c**0.5) * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))
        xn = (xf * inv * gamma_ref[...].astype(jnp.float32)).astype(x.dtype)
        x = xn * jax.nn.sigmoid(xn.astype(jnp.float32)).astype(x.dtype)
    rows = bh * w_out
    acc = jnp.zeros((rows, co), jnp.float32)
    for dt in range(kt):
        for dh in range(3):
            xs = x[dt, dh:dh + bh].reshape(rows, c)
            acc = acc + jnp.dot(xs, w_ref[dt, dh, 0],
                                preferred_element_type=jnp.float32)

    @pl.when(dw == 0)
    def _():
        acc_ref[...] = acc

    @pl.when(dw > 0)
    def _():
        acc_ref[...] += acc

    @pl.when(dw == 2)
    def _():
        o_ref[0] = (acc_ref[...] + b_ref[0].astype(jnp.float32)).reshape(
            bh, w_out, co).astype(o_ref.dtype)


def _conv_kernel_shift3(x0_ref, x1_ref, x2_ref, w_ref, b_ref, o_ref, *,
                        kt: int, bh: int, w_out: int, fuse_rms_silu: bool,
                        gamma_ref=None):
    """All kt*9 taps as clean [rows, C] @ [C, Co] dots — zero relayouts.

    The three dw (width) shifts of the 3x3 window arrive as three input
    refs whose BlockSpecs index the SAME array at Element offsets 0/1/2:
    the misaligned sublane slice happens in the HBM->VMEM DMA, not as an
    in-kernel VPU relayout (the relayouts cost ~half of "tap" mode's
    runtime at the decoder's 96/192-channel full-res stages). Each block's
    window is [kt, bh+2, w_out, C]; dh rides the untiled dim (free), dw
    picks the ref.
    """
    c = x0_ref.shape[-1]
    co = o_ref.shape[-1]
    rows = bh * w_out
    acc = jnp.zeros((rows, co), jnp.float32)
    for dw, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        x = x_ref[...]
        if fuse_rms_silu:
            xf = x.astype(jnp.float32)
            sq = jnp.sum(jnp.square(xf), axis=-1, keepdims=True)
            inv = (c**0.5) * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))
            xn = (xf * inv *
                  gamma_ref[...].astype(jnp.float32)).astype(x.dtype)
            x = xn * jax.nn.sigmoid(xn.astype(jnp.float32)).astype(x.dtype)
        for dt in range(kt):
            for dh in range(3):
                xs = x[dt, dh:dh + bh].reshape(rows, c)
                acc = acc + jnp.dot(xs, w_ref[dt, dh, dw],
                                    preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = acc.reshape(bh, w_out, co).astype(o_ref.dtype)


def _conv_kernel_tfold(x_ref, w_ref, b_ref, o_ref, *, bh: int, w_out: int,
                       fuse_rms_silu: bool, gamma_ref=None):
    """3x3 spatial taps over a TEMPORALLY K-FOLDED input.

    The caller concatenates the kt time-shifted views on channels
    (x: [T_out, H+2, W+2, kt*C]), so every dot is [rows, kt*C] @ [kt*C, Co]
    — K = 288 at the decoder's 96-channel stage fills the MXU's 128
    contraction rows (vs 96 = 75% in "tap" mode). dh/dw shifts stay
    in-kernel. fuse_rms_silu is NOT supported here (the fold mixes frames
    in the channel dim, so a per-token norm can't run inside).
    """
    del fuse_rms_silu, gamma_ref
    kc = x_ref.shape[-1]
    co = o_ref.shape[-1]
    rows = bh * w_out
    x = x_ref[...]
    acc = jnp.zeros((rows, co), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            xs = x[0, dh:dh + bh, dw:dw + w_out, :].reshape(rows, kc)
            acc = acc + jnp.dot(xs, w_ref[dh, dw],
                                preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = acc.reshape(bh, w_out, co).astype(o_ref.dtype)


def _pick_bh(h: int, w: int, c: int, kt: int, mode: str = "tap",
             co: int = 0, itemsize: int = 2) -> int:
    """Largest h-tile whose double-buffered window fits a VMEM budget."""
    co = co or c
    co_pad = -(-co // 128) * 128
    # thcw: throughput is flat in bh at 96 ch but drops past bh=4 at 192 ch
    # (measured 91.7 vs 81.4 TF/s) — the N stream, not the h tile, is what
    # amortizes; keep windows small. kf: measured best at bh=8 @96 ch and
    # bh=4 @192/384 (drops at bh=8 for 384).
    if mode == "thcw":
        cands = (4, 2, 1)
    elif mode == "kf":
        cands = (8, 4, 2, 1) if c <= 128 else (4, 2, 1)
    else:
        cands = (16, 12, 8, 6, 4, 2, 1)
    for bh in cands:
        if h % bh:
            continue
        # input window at the actual activation dtype, double-buffered
        win = kt * (bh + 2) * (w + 2) * c * itemsize * 2
        if mode == "tfold":
            # single time-row window, channels already kt-folded
            win = (bh + 2) * (w + 2) * kt * c * itemsize * 2
            budget = 8 * 1024 * 1024
            acc = bh * w * co * 4 * 2
        elif mode == "shift3":
            # three dw-shifted copies of the window, double-buffered; the
            # fp32 accumulator is SSA (Mosaic stack)
            win = 3 * kt * (bh + 2) * w * c * itemsize * 2
            budget = 11 * 1024 * 1024
            acc = bh * w * co * 4 * 2
        elif mode == "dma":
            # explicit fp32 scratch accumulator + per-dot SSA partials
            budget = 10 * 1024 * 1024
            acc = bh * w * co * 4 * 2
        elif mode == "nb":
            # explicit VMEM scratch accumulator -> full scoped-vmem budget
            budget = 11 * 1024 * 1024
            acc = bh * (w + 2) * 3 * co_pad * 4
        elif mode == "hoist":
            # one live shifted window copy + fp32 accumulator on the stack
            budget = 11 * 1024 * 1024
            acc = bh * w * co * 4 * 2 + kt * (bh + 2) * w * c * itemsize
        elif mode in ("thcw", "kf"):
            # transposed window [kt, bh+2, C, wp]; per-row fp32 accumulator
            # (kf additionally holds the [3, Co, kt*3*C] weights in VMEM,
            # which matter at 384 ch: ~8 MB bf16)
            win = kt * (bh + 2) * (w + 2) * c * itemsize * 2
            budget = 11 * 1024 * 1024
            acc = co * w * 4 * 2
            if mode == "kf":
                # weights aren't double-buffered (grid-constant) but do sit
                # in VMEM; the kernel runs at vmem_limit=96M so the budget
                # here is pipelining headroom, not the hard cap
                budget = 24 * 1024 * 1024
                acc += 3 * co * kt * 3 * c * itemsize
        else:
            # SSA fp32 accumulator lands on Mosaic's stack, which shares the
            # 16 MB scoped limit with spills — stay conservative or the
            # kernel dies with a scoped-vmem stack OOM at decoder shapes.
            budget = 6 * 1024 * 1024
            acc = bh * w * co * 4 * 2
        out = bh * w * co * itemsize * 2
        if win + acc + out < budget:
            return bh
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("kt", "fuse_rms_silu", "out_dtype", "mode",
                     "bh_override"))
def _conv3d_pallas(x: Array, w: Array, b: Array, gamma: Array | None, *,
                   kt: int, fuse_rms_silu: bool, out_dtype,
                   mode: str = "tap", bh_override: int | None = None) -> Array:
    """x: [T_out+kt-1, H+2, W+2, C] pre-padded. w: [kt,3,3,C,Co]."""
    tp, hp, wp, c = x.shape
    t_out, h, w_out = tp - kt + 1, hp - 2, wp - 2
    co = w.shape[-1]
    bh = bh_override or _pick_bh(h, w_out, c, kt, mode, co,
                                 itemsize=x.dtype.itemsize)
    if mode == "dma":
        # dw rides the innermost grid dim; the window's width shift is an
        # Element offset resolved by the DMA engine, so the kernel body is
        # a clean stream of kt*3 dots with no sublane relayouts.
        grid = (t_out, h // bh, 3)
        in_specs = [
            pl.BlockSpec(
                (Element(kt), Element(bh + 2), Element(w_out), Element(c)),
                lambda t, i, dw: (t, i * bh, dw, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, 3, 1, c, co), lambda t, i, dw: (0, 0, dw, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        args = [x, w, b.reshape(1, co)]
        if fuse_rms_silu:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            args.append(gamma.reshape(1, c))
        scratch_shapes = [pltpu.VMEM((bh * w_out, co), jnp.float32)]

        def kernel(*refs):
            x_ref, w_ref, b_ref = refs[:3]
            rest = list(refs[3:])
            g_ref = rest.pop(0) if fuse_rms_silu else None
            o_ref, acc_ref = rest
            _conv_kernel_dma(x_ref, w_ref, b_ref, o_ref, acc_ref, kt=kt,
                             bh=bh, w_out=w_out,
                             fuse_rms_silu=fuse_rms_silu, gamma_ref=g_ref)

        flops = 2 * t_out * h * w_out * c * co * kt * 9
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bh, w_out, co),
                                   lambda t, i, dw: (t, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t_out, h, w_out, co), out_dtype),
            scratch_shapes=scratch_shapes,
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=x.size * x.dtype.itemsize * 4,
                transcendentals=0),
            interpret=_use_interpret(),
        )(*args)
    if mode == "tfold":
        # temporal K-fold: [T_out, H+2, W+2, kt*C] built by the caller
        # (x here is still [tp, hp, wp, c]; fold now)
        xf = jnp.concatenate([x[dt:dt + t_out] for dt in range(kt)],
                             axis=-1)
        wf = w.transpose(1, 2, 0, 3, 4).reshape(3, 3, kt * c, co)
        grid = (t_out, h // bh)
        in_specs = [
            pl.BlockSpec(
                (Element(1), Element(bh + 2), Element(wp), Element(kt * c)),
                lambda t, i: (t, i * bh, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]

        def kernel(x_ref, w_ref, b_ref, o_ref):
            _conv_kernel_tfold(x_ref, w_ref, b_ref, o_ref, bh=bh,
                               w_out=w_out, fuse_rms_silu=False)

        flops = 2 * t_out * h * w_out * c * co * kt * 9
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bh, w_out, co),
                                   lambda t, i: (t, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t_out, h, w_out, co), out_dtype),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=x.size * x.dtype.itemsize * 4,
                transcendentals=0),
            interpret=_use_interpret(),
        )(xf, wf, b.reshape(1, co))
    if mode == "shift3":
        grid = (t_out, h // bh)
        x_spec = lambda dw: pl.BlockSpec(  # noqa: E731
            (Element(kt), Element(bh + 2), Element(w_out), Element(c)),
            lambda t, i, dw=dw: (t, i * bh, dw, 0),
            memory_space=pltpu.VMEM)
        in_specs = [x_spec(0), x_spec(1), x_spec(2),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM)]
        args = [x, x, x, w, b.reshape(1, co)]
        if fuse_rms_silu:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            args.append(gamma.reshape(1, c))

        def kernel(*refs):
            x0, x1, x2, w_ref, b_ref = refs[:5]
            rest = list(refs[5:])
            g_ref = rest.pop(0) if fuse_rms_silu else None
            o_ref = rest.pop(0)
            _conv_kernel_shift3(x0, x1, x2, w_ref, b_ref, o_ref, kt=kt,
                                bh=bh, w_out=w_out,
                                fuse_rms_silu=fuse_rms_silu,
                                gamma_ref=g_ref)

        flops = 2 * t_out * h * w_out * c * co * kt * 9
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bh, w_out, co),
                                   lambda t, i: (t, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t_out, h, w_out, co), out_dtype),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=x.size * x.dtype.itemsize * 4,
                transcendentals=0),
            interpret=_use_interpret(),
        )(*args)
    grid = (t_out, h // bh)
    if mode == "nb":
        # Repack [kt,3,3,C,Co] -> [kt,3,C,3*co_pad]: dw tap blocks side by
        # side on N, each padded to a 128-lane tile so the epilogue's
        # channel-block slices are lane-aligned (no in-kernel relayouts).
        co_pad = -(-co // 128) * 128
        wn = jnp.pad(w.transpose(0, 1, 3, 4, 2),  # [kt,3,C,Co,dw]
                     ((0, 0), (0, 0), (0, 0), (0, co_pad - co), (0, 0)))
        w = wn.transpose(0, 1, 2, 4, 3).reshape(kt, 3, c, 3 * co_pad)

    in_specs = [
        pl.BlockSpec(
            (Element(kt), Element(bh + 2), Element(wp), Element(c)),
            lambda t, i: (t, i * bh, 0, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [x, w, b.reshape(1, co)]
    if fuse_rms_silu:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(gamma.reshape(1, c))

    scratch_shapes = []
    if mode == "nb":
        co_pad = w.shape[-1] // 3
        scratch_shapes.append(
            pltpu.VMEM((bh * wp, 3 * co_pad), jnp.float32))

    def kernel(*refs):
        x_ref, w_ref, b_ref = refs[:3]
        rest = list(refs[3:])
        g_ref = rest.pop(0) if fuse_rms_silu else None
        o_ref = rest.pop(0)
        accw_ref = rest.pop(0) if mode == "nb" else None
        if mode == "hoist":
            _conv_kernel_hoist(x_ref, w_ref, b_ref, o_ref, kt=kt, bh=bh,
                               w_out=w_out, fuse_rms_silu=fuse_rms_silu,
                               gamma_ref=g_ref)
        else:
            _conv_kernel(x_ref, w_ref, b_ref, o_ref, kt=kt, bh=bh,
                         w_out=w_out, fuse_rms_silu=fuse_rms_silu,
                         gamma_ref=g_ref, mode=mode, accw_ref=accw_ref)

    flops = 2 * t_out * h * w_out * c * co * kt * 9
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bh, w_out, co),
                               lambda t, i: (t, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_out, h, w_out, co), out_dtype),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0),
        interpret=_use_interpret(),
    )(*args)


def conv3d_ndhwc(x: Array, w: Array, b: Array, *, time_pad: int,
                 gamma: Array | None = None, mode: str = "tap",
                 bh_override: int | None = None) -> Array:
    """Causal 3D conv on [B, T, H, W, C] with kernel [kt, 3, 3, C, Co].

    ``time_pad`` zeros are prepended temporally (causal); spatial padding is
    SAME (1, 1). When ``gamma`` is given, computes
    ``conv(silu(rmsnorm(x) * sqrt(C) * gamma))`` fused in one kernel pass.
    """
    kt = w.shape[0]
    bsz = x.shape[0]
    if mode == "wino":
        from fastvideo_tpu.ops.winograd import conv3d_winograd_ndhwc

        try:
            return conv3d_winograd_ndhwc(x, w, b, time_pad=time_pad,
                                         gamma=gamma)
        except Exception:
            # the 96-ch full-res decoder stage is known to fail compile on
            # this libtpu (round-4 ladder); fall through to the direct path
            # rather than crash mid-decode
            mode = "auto"
    if mode in ("auto_int8", "kf_int8"):
        # W8A8 decode convs: per-tensor activation scale + per-Co weight
        # scale through the int8 kf kernel (kernel probe 1.44-1.54x over
        # bf16 kf; full 81f/480p decode 3.63 -> 3.00 s, exp_decode_int8.py
        # — and the int8 TRANSPOSE+PAD also halves, it moves 1 byte/elem).
        # int8 sublane tiling needs C and Co to be 32-multiples in the
        # transposed layout; everything else (conv_in C=16, conv_out Co=3,
        # narrow frames) keeps the bf16 policy — a small FLOP slice.
        cin, cout = x.shape[-1], w.shape[-1]
        int8_ok = (cin % 32 == 0 and cout % 32 == 0
                   and (mode == "kf_int8"
                        or (cin >= 64 and x.shape[3] >= 256)))
        if int8_ok:
            if gamma is not None:
                sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                             keepdims=True)
                inv = ((cin**0.5) *
                       jax.lax.rsqrt(jnp.maximum(sq, 1e-24))).astype(x.dtype)
                x = jax.nn.silu(x * inv * gamma.astype(x.dtype))
            xq, sx = _quantize_int8(x, axes=None)
            wq, sw = _quantize_int8(w, axes=(0, 1, 2, 3))  # [1,1,1,1,Co]
            scale = (sw.reshape(-1) * sx.reshape(()))  # [Co] fp32
            xt = jnp.pad(xq.transpose(0, 1, 2, 4, 3),
                         ((0, 0), (time_pad, 0), (1, 1), (0, 0), (1, 1)))
            wt = wq.transpose(2, 4, 0, 1, 3).reshape(3, cout, kt * 3 * cin)
            outs = [
                _conv3d_pallas_thcw_int8(xt[i], wt, b, scale, kt=kt,
                                         out_dtype=x.dtype,
                                         bh_override=bh_override)
                for i in range(bsz)
            ]
            return jnp.stack(outs, axis=0).transpose(0, 1, 2, 4, 3)
        mode = "auto" if mode == "auto_int8" else "kf"
    if mode == "auto":
        # Per-shape choice, measured on v5e (scripts/exp_conv_probe2.py +
        # exp_conv_kfold.py): the transposed orientation wins at every
        # heavy decoder stage because it puts the wide W axis on the MXU's
        # N lanes instead of the 96/192-sized Co, and the K-folded variant
        # (kf) adds 96.4% contraction fill on top — 108 vs 66 (tap) vs 92
        # (thcw) TF/s @96 ch, 108 vs 70 vs 87 @192, 103 vs 74 vs 100 @384.
        # tap only stays ahead on tiny-K heads (conv_in's 16 input
        # channels) and narrow frames.
        cin = x.shape[-1]
        mode = "kf" if cin >= 64 and x.shape[3] >= 256 else "tap"
    if mode in ("thcw", "kf"):
        if gamma is not None:
            # norm+silu prologue runs unfused here (C sits on sublanes in
            # the thcw kernel; a cross-sublane norm inside isn't worth it —
            # the fused path is opt-in and measured slower even on tap)
            sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                         keepdims=True)
            inv = ((x.shape[-1]**0.5) *
                   jax.lax.rsqrt(jnp.maximum(sq, 1e-24))).astype(x.dtype)
            x = jax.nn.silu(x * inv * gamma.astype(x.dtype))
        xt = jnp.pad(x.transpose(0, 1, 2, 4, 3),
                     ((0, 0), (time_pad, 0), (1, 1), (0, 0), (1, 1)))
        if mode == "kf":
            # rows ordered (dt, dh, C) to match the kernel's reshape view
            co = w.shape[-1]
            c = w.shape[-2]
            wt = w.astype(x.dtype).transpose(2, 4, 0, 1, 3).reshape(
                3, co, kt * 3 * c)
        else:
            wt = w.astype(x.dtype).transpose(0, 1, 2, 4, 3)  # [kt,3,3,Co,C]
        outs = [
            _conv3d_pallas_thcw(xt[i], wt, b.astype(x.dtype), kt=kt,
                                out_dtype=x.dtype, bh_override=bh_override,
                                fold=mode == "kf")
            for i in range(bsz)
        ]
        return jnp.stack(outs, axis=0).transpose(0, 1, 2, 4, 3)
    if mode == "tfold" and gamma is not None:
        # the temporal K-fold mixes frames on the channel dim, so the
        # norm+silu prologue must run before folding (unfused)
        sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                     keepdims=True)
        inv = ((x.shape[-1]**0.5) *
               jax.lax.rsqrt(jnp.maximum(sq, 1e-24))).astype(x.dtype)
        x = jax.nn.silu(x * inv * gamma.astype(x.dtype))
        gamma = None
    pads = ((0, 0), (time_pad, 0), (1, 1), (1, 1), (0, 0))
    x = jnp.pad(x, pads)
    outs = []
    for i in range(bsz):  # decode batch is ~1; tiles fold into T upstream
        outs.append(_conv3d_pallas(
            x[i], w.astype(x.dtype), b, gamma, kt=kt,
            fuse_rms_silu=gamma is not None, out_dtype=x.dtype, mode=mode,
            bh_override=bh_override))
    return jnp.stack(outs, axis=0)


def supports(kernel_size: tuple[int, int, int], stride: tuple[int, int, int],
             padding: tuple[int, int, int], cin: int, cout: int,
             w_dim: int | None = None, mode: str | None = None,
             h_dim: int | None = None) -> bool:
    """Shapes this kernel accelerates; everything else falls back to XLA.

    The thcw orientation streams Co on the MXU's M dim (not lanes), so it
    additionally covers ragged output channels like the decoder's
    conv_out 96->3 (measured 2.3x over the XLA 2D-tap path) — allowed
    when the caller passes its width and a thcw-capable mode.
    """
    kt, kh, kw = kernel_size
    if mode == "wino":
        from fastvideo_tpu.ops import winograd

        return winograd.supports(kernel_size, stride, padding, cin, cout,
                                 h_dim=h_dim, w_dim=w_dim)
    base = (kh == 3 and kw == 3 and kt in (1, 3) and stride == (1, 1, 1)
            and padding[1] == 1 and padding[2] == 1 and cin % 8 == 0)
    if not base:
        return False
    if cout % 8 == 0:
        return True
    return (mode in ("thcw", "kf", "auto", "auto_int8", "kf_int8")
            and w_dim is not None and w_dim >= 256 and cin >= 64)
