"""Pallas conv3d kernel vs XLA 3D conv (interpret mode on CPU).

Covers the causal-VAE hot-path shapes in miniature: kt in {1, 3}, both
kernel modes the VAE can select, and the fused rmsnorm+silu prologue.
Reference math: the causal Conv3d of
/root/reference/fastvideo/models/vaes/wanvae.py:157-206.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvideo_tpu.ops.conv3d import conv3d_ndhwc, supports


def _ref_conv3d(x, w, b, time_pad, gamma=None):
    if gamma is not None:
        xf = x.astype(jnp.float32)
        c = x.shape[-1]
        sq = jnp.sum(jnp.square(xf), axis=-1, keepdims=True)
        inv = (c**0.5) * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))
        xn = xf * inv * gamma.astype(jnp.float32)
        x = (xn * jax.nn.sigmoid(xn)).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (time_pad, 0), (1, 1), (1, 1), (0, 0)))
    o = jax.lax.conv_general_dilated(
        xp.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return o + b.astype(jnp.float32)


@pytest.mark.parametrize("mode", ["tap", "dma", "hoist", "thcw", "kf",
                                  "auto"])
@pytest.mark.parametrize("kt,fuse", [(3, False), (3, True), (1, False)])
def test_conv3d_matches_xla(mode, kt, fuse):
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    t, h, w_, c, co = 4, 8, 16, 16, 24
    x = jax.random.normal(k1, (1, t, h, w_, c), jnp.float32)
    w = jax.random.normal(k2, (kt, 3, 3, c, co), jnp.float32) * 0.05
    b = jax.random.normal(k3, (co,), jnp.float32) * 0.1
    gamma = jax.random.normal(k4, (c,), jnp.float32) * 0.2 + 1.0 if fuse \
        else None
    tp = kt - 1

    ref = _ref_conv3d(x, w, b, tp, gamma)
    out = conv3d_ndhwc(x, w, b, time_pad=tp, gamma=gamma, mode=mode)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-3, rtol=2e-3)


def test_conv3d_batched():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 3, 4, 8, 8), jnp.float32)
    w = jax.random.normal(key, (3, 3, 3, 8, 8), jnp.float32) * 0.1
    b = jnp.zeros((8,), jnp.float32)
    ref = _ref_conv3d(x, w, b, 2)
    out = conv3d_ndhwc(x, w, b, time_pad=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_supports_gate():
    assert supports((3, 3, 3), (1, 1, 1), (2, 1, 1), 96, 96)
    assert supports((1, 3, 3), (1, 1, 1), (0, 1, 1), 128, 96)
    assert not supports((3, 3, 3), (2, 2, 2), (2, 1, 1), 96, 96)
    assert not supports((3, 1, 1), (1, 1, 1), (2, 0, 0), 96, 96)
    assert not supports((3, 3, 3), (1, 1, 1), (2, 1, 1), 12, 96)
    # ragged cout (conv_out 96->3): only via a thcw-capable mode + wide W
    assert not supports((3, 3, 3), (1, 1, 1), (2, 1, 1), 96, 3)
    assert supports((3, 3, 3), (1, 1, 1), (2, 1, 1), 96, 3, w_dim=832,
                    mode="auto")
    assert not supports((3, 3, 3), (1, 1, 1), (2, 1, 1), 96, 3, w_dim=104,
                        mode="auto")
    assert not supports((3, 3, 3), (1, 1, 1), (2, 1, 1), 96, 3, w_dim=832,
                        mode="tap")


@pytest.mark.parametrize("fuse", [False, True])
def test_conv3d_kf_int8_tracks_fp32(fuse):
    """W8A8 kf path vs fp32 reference at quantization tolerance."""
    key = jax.random.PRNGKey(3)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    t, h, w_, c, co = 4, 8, 16, 32, 32
    x = jax.random.normal(k1, (1, t, h, w_, c), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 3, c, co), jnp.float32) * 0.05
    b = jax.random.normal(k3, (co,), jnp.float32) * 0.1
    gamma = (jax.random.normal(k4, (c,), jnp.float32) * 0.2 + 1.0
             if fuse else None)
    ref = np.asarray(_ref_conv3d(x, w, b, 2, gamma), np.float32)
    out = conv3d_ndhwc(x, w, b, time_pad=2, gamma=gamma, mode="kf_int8")
    assert out.shape == ref.shape
    # int8 per-tensor activations: compare at quantization granularity
    scale = np.abs(ref).max()
    err = np.abs(np.asarray(out, np.float32) - ref).max()
    assert err < 0.04 * scale, f"int8 conv err {err} vs scale {scale}"


def test_conv3d_kf_int8_exact_on_grid():
    """Inputs already on the int8 grid round-trip exactly: quantize is
    lossless and the int32 accumulation is exact, so the int8 kernel must
    match the fp32 conv bit-for-bit (modulo the fp32 epilogue)."""
    rng = np.random.default_rng(0)
    t, h, w_, c, co = 3, 4, 16, 32, 32
    # activations: integers in [-127, 127] with the max present -> sx = 1
    xi = rng.integers(-127, 128, (1, t, h, w_, c)).astype(np.float32)
    xi.flat[0] = 127.0
    # weights: per-channel integer grids with max 127 -> sw exact
    wi = rng.integers(-127, 128, (3, 3, 3, c, co)).astype(np.float32)
    wi[0, 0, 0, 0, :] = 127.0
    wsc = (np.arange(co, dtype=np.float32) % 7 + 1.0) * 1e-3
    w = jnp.asarray(wi * wsc)
    x = jnp.asarray(xi)
    b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
    ref = np.asarray(_ref_conv3d(x, w, b, 2), np.float32)
    out = np.asarray(
        conv3d_ndhwc(x, w, b, time_pad=2, mode="kf_int8"), np.float32)
    np.testing.assert_allclose(out, ref, atol=1e-2, rtol=1e-5)


def test_conv3d_int8_mode_falls_back():
    """Shapes the int8 kernel can't tile (C or Co not 32-multiples) keep
    the bf16 policy instead of failing."""
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (1, 3, 8, 16, 16), jnp.float32)
    w = jax.random.normal(key, (3, 3, 3, 16, 24), jnp.float32) * 0.1
    b = jnp.zeros((24,), jnp.float32)
    ref = _ref_conv3d(x, w, b, 2)
    out = conv3d_ndhwc(x, w, b, time_pad=2, mode="auto_int8")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
    assert supports((3, 3, 3), (1, 1, 1), (2, 1, 1), 96, 3, w_dim=832,
                    mode="auto_int8")


def test_conv3d_thcw_ragged_cout():
    """conv_out analog: Co=3 through the transposed-orientation kernel."""
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (1, 3, 8, 16, 16), jnp.float32)
    w = jax.random.normal(key, (3, 3, 3, 16, 3), jnp.float32) * 0.1
    b = jnp.ones((3,), jnp.float32) * 0.5
    ref = _ref_conv3d(x, w, b, 2)
    out = conv3d_ndhwc(x, w, b, time_pad=2, mode="thcw")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
    out_kf = conv3d_ndhwc(x, w, b, time_pad=2, mode="kf")
    np.testing.assert_allclose(np.asarray(out_kf), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
