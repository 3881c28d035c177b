"""Pallas flash attention backward matches dense-attention gradients."""

import numpy as np
import pytest


@pytest.mark.parametrize("causal", [False, True])
def test_flash_backward_matches_dense(causal):
    import jax
    import jax.numpy as jnp

    from fastvideo_tpu.ops.flash_attention import (_reference_attention,
                                                   flash_attention)

    rng = np.random.default_rng(0)
    B, S, H, D = 1, 200, 2, 32
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype=jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype=jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal,
                                       block_q=128, block_kv=128) * g)

    def loss_dense(q, k, v):
        scale = 1.0 / np.sqrt(D)
        out = _reference_attention(q.transpose(0, 2, 1, 3),
                                   k.transpose(0, 2, 1, 3),
                                   v.transpose(0, 2, 1, 3), scale, causal,
                                   S).transpose(0, 2, 1, 3)
        return jnp.sum(out * g)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gf, gd, strict=True):
        err = float(jnp.abs(a - b).max())
        scale = float(jnp.abs(b).max()) + 1e-6
        assert err / scale < 5e-3, (name, err, scale)


def test_flash_backward_kv_valid():
    import jax
    import jax.numpy as jnp

    from fastvideo_tpu.ops.flash_attention import (_reference_attention,
                                                   flash_attention)

    rng = np.random.default_rng(1)
    B, S, H, D = 1, 160, 2, 32
    valid = 130
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype=jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype=jnp.float32)

    def loss_flash(q):
        return jnp.sum(flash_attention(q, q, q, kv_valid=valid,
                                       block_q=128, block_kv=128) * g)

    def loss_dense(q):
        scale = 1.0 / np.sqrt(D)
        qt = q.transpose(0, 2, 1, 3)
        out = _reference_attention(qt, qt, qt, scale, False,
                                   valid).transpose(0, 2, 1, 3)
        return jnp.sum(out * g)

    gf = jax.grad(loss_flash)(q)
    gd = jax.grad(loss_dense)(q)
    err = float(jnp.abs(gf - gd).max())
    scale = float(jnp.abs(gd).max()) + 1e-6
    assert err / scale < 5e-3, (err, scale)
