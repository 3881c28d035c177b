"""NABLA numeric tests: adaptive block mask + dynamic-count sparse kernel
vs dense masked-attention reference math (reference
attention/backends/nabla.py:32-61 nablaT_v2 semantics)."""

import numpy as np
import pytest


def _dense_masked_reference(q, k, v, mask, scale):
    """Dense softmax attention with kv BLOCKS masked out.

    q/k/v: [B, S, H, D]; mask: [B, H, nQ, nK] over 64-token blocks.
    """
    import jax.numpy as jnp

    b, s, h, d = q.shape
    nb = s // 64
    qt = q.transpose(0, 2, 1, 3).astype(jnp.float32)
    kt = k.transpose(0, 2, 1, 3).astype(jnp.float32)
    vt = v.transpose(0, 2, 1, 3).astype(jnp.float32)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qt, kt) * scale
    tok_mask = jnp.repeat(jnp.repeat(mask, 64, axis=2), 64, axis=3)
    scores = jnp.where(tok_mask, scores, -jnp.inf)
    out = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, axis=-1), vt)
    return out.transpose(0, 2, 1, 3)


import jax  # noqa: E402


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    B, S, H, D = 1, 4 * 64, 2, 64
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    return q, k, v


def test_nabla_mask_math(data):
    """The kept set per row is the smallest suffix of sorted blocks with
    cumulative softmax mass >= thr (plus the STA OR)."""
    import jax.numpy as jnp

    from fastvideo_tpu.ops.nabla import nabla_block_mask

    q, k, v = data
    thr = 0.7
    mask = np.asarray(nabla_block_mask(jnp.asarray(q), jnp.asarray(k),
                                       None, thr))
    b, s, h, d = q.shape
    nb = s // 64
    qa = q.reshape(b, nb, 64, h, d).mean(2).transpose(0, 2, 1, 3)
    ka = k.reshape(b, nb, 64, h, d).mean(2).transpose(0, 2, 1, 3)
    logits = qa @ ka.transpose(0, 1, 3, 2) / np.sqrt(d)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    # kept mass must reach thr, and dropping the smallest kept block
    # must fall below thr
    kept_mass = (p * mask).sum(-1)
    assert (kept_mass >= thr - 1e-5).all()
    assert mask.any(-1).all()
    # STA OR
    sta = np.zeros((b, h, nb, nb), bool)
    sta[..., 0] = True
    m2 = np.asarray(nabla_block_mask(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(sta), thr))
    assert m2[..., 0].all()
    assert (m2 | mask == m2).all()


def test_nabla_attention_vs_dense_masked(data):
    import jax.numpy as jnp

    from fastvideo_tpu.ops.nabla import (nabla_attention, nabla_block_mask)

    q, k, v = data
    thr = 0.8
    scale = 1.0 / np.sqrt(q.shape[-1])
    mask = nabla_block_mask(jnp.asarray(q), jnp.asarray(k), None, thr)
    ref = np.asarray(
        _dense_masked_reference(jnp.asarray(q), jnp.asarray(k),
                                jnp.asarray(v), mask, scale))
    got = np.asarray(
        nabla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        thr=thr))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-4)


def test_nabla_thr1_equals_dense(data):
    """thr -> 1 keeps every block: must match dense attention."""
    import jax.numpy as jnp

    from fastvideo_tpu.ops.nabla import nabla_attention

    q, k, v = data
    out = np.asarray(
        nabla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        thr=1.0))
    dense = np.asarray(
        jax.nn.dot_product_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v)))
    np.testing.assert_allclose(out, dense, atol=2e-5, rtol=2e-4)


def test_nabla_backend_selector():
    from fastvideo_tpu.attention.selector import get_attn_backend

    be = get_attn_backend(2, 64, supported=("NABLA_ATTN",))
    assert be.name == "NABLA_ATTN"
