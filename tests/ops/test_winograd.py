"""Winograd F(2x2,3x3) conv3d vs XLA 3D conv.

Reference math: the causal Conv3d of
/root/reference/fastvideo/models/vaes/wanvae.py:157-206; the Winograd
formulation is TPU-specific (ops/winograd.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvideo_tpu.ops.winograd import conv3d_winograd_ndhwc, supports


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


@pytest.mark.parametrize("kt,fuse", [(3, False), (3, True), (1, False)])
def test_winograd_matches_xla(kt, fuse):
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
    out = conv3d_winograd_ndhwc(x, w, b, time_pad=tp, gamma=gamma)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=5e-3, rtol=5e-3)


def test_winograd_bf16_deviation_budget():
    """bf16 GEMM inputs: deviation vs fp32 conv stays ~1e-2 at unit scale."""
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (1, 3, 16, 16, 32), jnp.bfloat16)
    w = (jax.random.normal(k2, (3, 3, 3, 32, 32), jnp.float32)
         * (1.0 / 32**0.5))
    b = jnp.zeros((32,), jnp.float32)
    ref = _ref_conv3d(x.astype(jnp.float32), w, b, 2)
    out = conv3d_winograd_ndhwc(x, w.astype(jnp.bfloat16), b, time_pad=2)
    err = np.max(np.abs(np.asarray(out, np.float32) - np.asarray(ref)))
    scale = np.max(np.abs(np.asarray(ref)))
    assert err / scale < 0.05, (err, scale)


def test_supports():
    # 96-ch at full 480p resolution is the known libtpu compile failure
    # (round-4 ladder: remote_compile 500) — supports() must reject it so
    # FASTVIDEO_VAE_CONV3D=wino falls back instead of crashing mid-decode.
    assert not supports((3, 3, 3), (1, 1, 1), (2, 1, 1), 96, 96, h_dim=480,
                        w_dim=832)
    # ...but the same channel count at half resolution still runs
    assert supports((3, 3, 3), (1, 1, 1), (2, 1, 1), 96, 96, h_dim=240,
                    w_dim=416)
    # ...and wider stages at full resolution do too
    assert supports((3, 3, 3), (1, 1, 1), (2, 1, 1), 384, 384, h_dim=480,
                    w_dim=832)
    assert not supports((3, 3, 3), (1, 1, 1), (2, 1, 1), 96, 96, h_dim=479,
                        w_dim=832)
    assert not supports((3, 3, 3), (2, 2, 2), (2, 1, 1), 96, 96, h_dim=480,
                        w_dim=832)
    assert not supports((1, 1, 1), (1, 1, 1), (0, 0, 0), 96, 96, h_dim=480,
                        w_dim=832)
