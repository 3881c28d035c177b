"""Dense optical flow, TPU-native.

The reference's flow metrics run an external CNN flow model (ptlflow
DPFlow — /root/reference/fastvideo/eval/metrics/optical_flow/_shared.py
:248-280). Under zero egress there are no flow-model weights, so the
backbone here is a classical **pyramidal iterative Lucas–Kanade** solver
written in pure JAX: image pyramids, bilinear warping, windowed normal
equations — one jitted XLA program per resolution, batched over frame
pairs so the per-pixel 2x2 solves vectorise onto the VPU.

The comparison/aggregation side (EPE, angle error, FoE, flow KL,
temporal aggregation) reproduces the reference pipeline behaviorally in
``fastvideo_tpu/eval/suite/optical_flow.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _box_filter(x: Array, win: int) -> Array:
    """Uniform [win x win] window sum via two separable 1-D convolutions
    (SAME padding). x: [..., H, W]."""
    k = jnp.ones((win,), x.dtype)
    pad = win // 2

    def conv_last(v):
        vp = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(pad, win - 1 - pad)])
        return jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(
            vp.reshape(-1, vp.shape[-1])).reshape(*v.shape[:-1], -1)

    x = conv_last(x)
    x = jnp.swapaxes(conv_last(jnp.swapaxes(x, -1, -2)), -1, -2)
    return x


def _grad_xy(img: Array) -> tuple[Array, Array]:
    """Central-difference spatial gradients. img: [..., H, W]."""
    gx = (jnp.roll(img, -1, axis=-1) - jnp.roll(img, 1, axis=-1)) * 0.5
    gy = (jnp.roll(img, -1, axis=-2) - jnp.roll(img, 1, axis=-2)) * 0.5
    # roll wraps; zero the boundary columns/rows instead
    gx = gx.at[..., :, 0].set(0).at[..., :, -1].set(0)
    gy = gy.at[..., 0, :].set(0).at[..., -1, :].set(0)
    return gx, gy


def _warp_bilinear(img: Array, flow: Array) -> Array:
    """Sample img at (x + u, y + v). img: [H, W]; flow: [H, W, 2] (u, v)."""
    h, w = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=img.dtype),
                          jnp.arange(w, dtype=img.dtype), indexing="ij")
    x = jnp.clip(xx + flow[..., 0], 0.0, w - 1.0)
    y = jnp.clip(yy + flow[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = x - x0.astype(img.dtype)
    fy = y - y0.astype(img.dtype)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01) +
            fy * ((1 - fx) * v10 + fx * v11))


def _pyr_down(img: Array) -> Array:
    """5-tap binomial blur + 2x decimation. img: [H, W]."""
    k = jnp.array([1., 4., 6., 4., 1.], img.dtype) / 16.0
    pad = 2

    def sep(v, axis):
        vp = jnp.pad(v, [(pad, pad) if a == axis else (0, 0)
                         for a in range(v.ndim)], mode="edge")
        vm = jnp.moveaxis(vp, axis, -1)
        out = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(
            vm.reshape(-1, vm.shape[-1])).reshape(*vm.shape[:-1], -1)
        return jnp.moveaxis(out, -1, axis)

    blurred = sep(sep(img, 0), 1)
    return blurred[::2, ::2]


def _lk_level(i1: Array, i2: Array, flow: Array, *, win: int,
              iters: int, eps: float) -> Array:
    """Iterative LK refinement at one pyramid level."""
    gx, gy = _grad_xy(i1)

    def body(_, f):
        i2w = _warp_bilinear(i2, f)
        it = i2w - i1
        sxx = _box_filter(gx * gx, win) + eps
        syy = _box_filter(gy * gy, win) + eps
        sxy = _box_filter(gx * gy, win)
        sxt = _box_filter(gx * it, win)
        syt = _box_filter(gy * it, win)
        det = sxx * syy - sxy * sxy
        du = (-syy * sxt + sxy * syt) / det
        dv = (sxy * sxt - sxx * syt) / det
        # clamp the per-iteration update for stability on flat regions
        du = jnp.clip(du, -win, win)
        dv = jnp.clip(dv, -win, win)
        return f + jnp.stack([du, dv], axis=-1)

    return jax.lax.fori_loop(0, iters, body, flow)


@functools.partial(jax.jit, static_argnames=("levels", "win", "iters"))
def _flow_pair(i1: Array, i2: Array, levels: int, win: int,
               iters: int) -> Array:
    """Dense flow from i1 to i2. i1/i2: [H, W] grayscale float [0,1].
    Returns [H, W, 2] (u, v) in pixels."""
    eps = jnp.asarray(1e-4, i1.dtype)
    pyr1 = [i1]
    pyr2 = [i2]
    for _ in range(levels - 1):
        pyr1.append(_pyr_down(pyr1[-1]))
        pyr2.append(_pyr_down(pyr2[-1]))
    flow = jnp.zeros((*pyr1[-1].shape, 2), i1.dtype)
    for lvl in range(levels - 1, -1, -1):
        a, b = pyr1[lvl], pyr2[lvl]
        if lvl < levels - 1:
            # upsample flow to this level's shape, scale displacement 2x
            flow = jax.image.resize(flow * 2.0, (*a.shape, 2), "bilinear")
        flow = _lk_level(a, b, flow, win=win, iters=iters, eps=eps)
    return flow


def _to_gray(frames: np.ndarray) -> np.ndarray:
    """[T, H, W, C] float [0,1] -> [T, H, W] luma."""
    frames = np.asarray(frames, np.float32)
    if frames.ndim == 3:
        return frames
    if frames.shape[-1] == 1:
        return frames[..., 0]
    w = np.array([0.299, 0.587, 0.114], np.float32)
    return frames[..., :3] @ w


def extract_video_flows(frames: np.ndarray, *, levels: int | None = None,
                        win: int = 9, iters: int = 3) -> np.ndarray:
    """Flow for every consecutive pair. frames: [T, H, W, C] float [0,1].
    Returns [T-1, H, W, 2] float32 (u, v) pixels.

    All T-1 pairs go through one vmapped jitted program, so the TPU/CPU
    sees a single batched dispatch per video."""
    gray = _to_gray(frames)
    t, h, w = gray.shape
    if t < 2:
        return np.zeros((0, h, w, 2), np.float32)
    if levels is None:
        levels = int(max(1, min(4, np.log2(max(min(h, w), 2) / 16) + 1)))
    i1 = jnp.asarray(gray[:-1])
    i2 = jnp.asarray(gray[1:])
    flows = jax.vmap(lambda a, b: _flow_pair(a, b, levels, win, iters))(
        i1, i2)
    return np.asarray(flows, np.float32)
