"""Winograd F(2x2, 3x3) conv3d for the causal-VAE decode hot path.

The decoder's 3x3x3 convs are MXU-bound in the direct form: the best
direct Pallas kernel (ops/conv3d.py "kf") reaches ~108 TF/s on a 197
TF/s v5e, so the 278-TF decode conv budget costs ~2.6 s no matter how
the taps are blocked. Winograd F(2x2, 3x3) computes each 2x2 output
tile from 16 multiplies instead of 36 — a 2.25x reduction in MXU work —
at the price of input/output transforms whose coefficients are all
0/±1 (pure adds, fused by XLA) and a 4x transient for the transformed
input.

This implementation is XLA-level (no Pallas): the transforms are
elementwise adds over strided views and the 16-point batched GEMM is
([16, F*nt, C] @ [16, C, Co]). The temporal dimension stays direct
(kt taps accumulated).

Round-4 verdict (scripts/exp_conv_wino.py, v5e): REJECTED for
production. XLA lowers the strided-view transforms + batch-16 small-K
GEMM at 17.6 TF/s effective @192 ch and 38.6 @384 (vs the direct kf
kernel's 94.6 / 88.0), and the 96-ch full-res stage fails to compile
(remote_compile 500). The 2.25x multiply reduction is real but XLA
spends it all on data movement; capturing it needs a Pallas kernel
whose in-kernel transforms avoid the stride-2 lane relayouts, which is
exactly the Element-offset capability this libtpu rejects (see
ops/conv3d.py "shift3"). Kept selectable (FASTVIDEO_VAE_CONV3D=wino)
and parity-tested for when that lands.

Numerics: U = G w G^T is computed in fp32 (G has 1/2 entries); the
input transform's adds run in fp32 and are cast to bf16 for the GEMM;
accumulation is fp32. Measured max deviation vs the fp32 XLA conv is
~1e-2 at unit-normal inputs (tests/ops/test_winograd.py), comfortably
inside the decode-to-uint8 budget (PSNR gate 35 dB).

Reference behavior analog: the causal Conv3d modules of
/root/reference/fastvideo/models/vaes/wanvae.py:157-206 (math only;
the Winograd formulation is TPU-specific and has no reference analog).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# F(2x2, 3x3): out = A^T [ (G w G^T) ⊙ (B^T d B) ] A
_BT = np.array([[1, 0, -1, 0],
                [0, 1, 1, 0],
                [0, -1, 1, 0],
                [0, 1, 0, -1]], np.float32)
_G = np.array([[1, 0, 0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0, 0, 1]], np.float32)
_AT = np.array([[1, 1, 1, 0],
                [0, 1, -1, -1]], np.float32)


def _transform_weights(w: Array) -> Array:
    """w: [kt, 3, 3, C, Co] -> U: [16, kt, C, Co] in fp32 -> bf16-of-x."""
    wf = w.astype(jnp.float32)
    # G @ w @ G^T over the two spatial axes: [kt, 4, 4, C, Co]
    u = jnp.einsum("ah,khwco->kawco", jnp.asarray(_G), wf)
    u = jnp.einsum("bw,kawco->kabco", jnp.asarray(_G), u)
    kt, _, _, c, co = u.shape
    return u.reshape(kt, 16, c, co).transpose(1, 0, 2, 3)


def _input_transform(x: Array) -> Array:
    """x: [F, H+2, W+2, C] (spatially padded, H/W even) -> V: [16, F, nt, C].

    The 16 strided views d[a][b] = x[:, a::2, b::2, :][:H/2, :W/2] are the
    4x4 windows of every 2x2-output tile laid out as separate arrays; the
    B^T d B combination is 0/±1 adds on those views, which XLA fuses. The
    final stack/reshape to [16, F, nt, C] is contiguous (no transpose of
    the channel-minor data).
    """
    f, hp, wp, c = x.shape
    ho, wo = hp - 2, wp - 2
    nh, nw = ho // 2, wo // 2
    xf = x.astype(jnp.float32)
    d = [[xf[:, a:a + 2 * nh:2, b:b + 2 * nw:2, :] for b in range(4)]
         for a in range(4)]
    # rows: e[a] = (B^T d)[a]
    e = [
        [d[0][b] - d[2][b] for b in range(4)],
        [d[1][b] + d[2][b] for b in range(4)],
        [d[2][b] - d[1][b] for b in range(4)],
        [d[1][b] - d[3][b] for b in range(4)],
    ]
    # cols: V[a][b] = (e B)[a][b]
    v = []
    for a in range(4):
        v.append(e[a][0] - e[a][2])
        v.append(e[a][1] + e[a][2])
        v.append(e[a][2] - e[a][1])
        v.append(e[a][1] - e[a][3])
    # GEMM precision follows the activation dtype: bf16 in production,
    # fp32 when the caller computes in fp32 (exact parity with XLA conv)
    gemm_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else x.dtype
    out = jnp.stack(v, axis=0).astype(gemm_dtype)  # [16, F, nh, nw, C]
    return out.reshape(16, f, nh * nw, c)


def _output_transform(m: Array, nh: int, nw: int, out_dtype) -> Array:
    """m: [16, T, nt, Co] fp32 -> y: [T, H, W, Co]."""
    _, t, nt, co = m.shape
    mm = m.reshape(4, 4, t, nt, co)
    # rows: g[p] = (A^T m)[p]
    g = [mm[0] + mm[1] + mm[2], mm[1] - mm[2] - mm[3]]
    # cols: y[p][q] = (g A)[p][q]
    y = [[g[p][0] + g[p][1] + g[p][2], g[p][1] - g[p][2] - g[p][3]]
         for p in range(2)]
    yy = jnp.stack([jnp.stack(r, axis=0) for r in y], axis=0)
    # [2(p), 2(q), T, nt, Co] -> [T, nh, 2, nw, 2, Co] -> [T, H, W, Co]
    yy = yy.reshape(2, 2, t, nh, nw, co).transpose(2, 3, 0, 4, 1, 5)
    return yy.reshape(t, nh * 2, nw * 2, co).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("kt", "out_dtype"))
def _conv3d_wino_single(x: Array, u: Array, b: Array, *, kt: int,
                        out_dtype) -> Array:
    """x: [T_out+kt-1, H+2, W+2, C] pre-padded; u: [16, kt, C, Co]."""
    tp, hp, wp, c = x.shape
    t_out, ho, wo = tp - kt + 1, hp - 2, wp - 2
    nh, nw = ho // 2, wo // 2
    co = u.shape[-1]
    v = _input_transform(x)  # [16, tp, nt, C]
    m = None
    for dt in range(kt):
        part = jax.lax.dot_general(
            v[:, dt:dt + t_out], u[:, dt].astype(v.dtype),
            (((3,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [16, T, nt, Co]
        m = part if m is None else m + part
    y = _output_transform(m, nh, nw, out_dtype)
    return y + b.astype(out_dtype)


def conv3d_winograd_ndhwc(x: Array, w: Array, b: Array, *, time_pad: int,
                          gamma: Array | None = None) -> Array:
    """Causal 3D conv on [B, T, H, W, C], kernel [kt, 3, 3, C, Co].

    Same contract as ops/conv3d.conv3d_ndhwc (stride 1, SAME spatial
    padding, ``time_pad`` causal zeros, optional rmsnorm+silu prologue),
    computed via Winograd F(2x2, 3x3) on the spatial taps. Requires even
    H and W.
    """
    kt = w.shape[0]
    if gamma is not None:
        sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                     keepdims=True)
        inv = ((x.shape[-1]**0.5) *
               jax.lax.rsqrt(jnp.maximum(sq, 1e-24))).astype(x.dtype)
        x = jax.nn.silu(x * inv * gamma.astype(x.dtype))
    xp = jnp.pad(x, ((0, 0), (time_pad, 0), (1, 1), (1, 1), (0, 0)))
    u = _transform_weights(w)
    outs = [
        _conv3d_wino_single(xp[i], u, b, kt=kt, out_dtype=x.dtype)
        for i in range(x.shape[0])
    ]
    return jnp.stack(outs, axis=0)


def supports(kernel_size: tuple[int, int, int],
             stride: tuple[int, int, int],
             padding: tuple[int, int, int], cin: int, cout: int,
             h_dim: int | None = None, w_dim: int | None = None) -> bool:
    kt, kh, kw = kernel_size
    if (kh != 3 or kw != 3 or kt not in (1, 3) or stride != (1, 1, 1)
            or padding[1] != 1 or padding[2] != 1 or h_dim is None
            or w_dim is None or h_dim % 2 or w_dim % 2):
        return False
    # the 96-ch full-resolution decoder stage (480p and up) fails XLA
    # compile on this libtpu (round-4 ladder: remote_compile 500); reject
    # it here so FASTVIDEO_VAE_CONV3D=wino falls back instead of crashing
    if cin <= 96 and h_dim * w_dim >= 480 * 832:
        return False
    return True
