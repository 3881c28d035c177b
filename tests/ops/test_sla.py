"""SLA numeric tests vs dense reference math (reference
attention/backends/sla.py:78-346 semantics)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    B, S, H, D = 1, 4 * 64, 2, 64
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    return q, k, v


def test_sla_topk1_equals_dense(data):
    """topk_ratio=1 keeps every block; with zero combiner the output must
    equal dense attention."""
    import jax
    import jax.numpy as jnp

    from fastvideo_tpu.ops.sla import sla_attention

    q, k, v = data
    out = np.asarray(
        sla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                      topk_ratio=1.0))
    dense = np.asarray(
        jax.nn.dot_product_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v)))
    np.testing.assert_allclose(out, dense, atol=2e-5, rtol=2e-4)


def test_sla_sparse_matches_masked_dense(data):
    """The sparse branch must equal dense attention restricted to the
    top-k kv blocks of the (smooth-k) pooled block map."""
    import jax.numpy as jnp

    from fastvideo_tpu.ops.sla import sla_attention, sla_block_map

    q, k, v = data
    b, s, h, d = q.shape
    qt = jnp.asarray(q).transpose(0, 2, 1, 3)
    kt = jnp.asarray(k).transpose(0, 2, 1, 3)
    lut, topk = sla_block_map(qt, kt, 0.5)
    nb = s // 64
    mask = np.zeros((b, h, nb, nb), bool)
    lut_np = np.asarray(lut)
    for bi in range(b):
        for hi in range(h):
            for qi in range(nb):
                mask[bi, hi, qi, lut_np[bi, hi, qi]] = True

    scale = 1.0 / np.sqrt(d)
    qf = q.transpose(0, 2, 1, 3)
    kf = k.transpose(0, 2, 1, 3)
    vf = v.transpose(0, 2, 1, 3)
    scores = (qf @ kf.transpose(0, 1, 3, 2)) * scale
    tok_mask = np.repeat(np.repeat(mask, 64, axis=2), 64, axis=3)
    scores = np.where(tok_mask, scores, -np.inf)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ref = (p @ vf).transpose(0, 2, 1, 3)

    got = np.asarray(
        sla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                      topk_ratio=0.5))
    np.testing.assert_allclose(got, ref.astype(np.float32), atol=2e-5,
                               rtol=2e-4)


def test_sla_linear_branch_combiner(data):
    """A nonzero combiner must add the projected linear-attention branch."""
    import jax.numpy as jnp

    from fastvideo_tpu.ops.sla import linear_attention, sla_attention

    q, k, v = data
    d = q.shape[-1]
    rng = np.random.default_rng(1)
    w = rng.standard_normal((d, d)).astype(np.float32) * 0.1
    bias = rng.standard_normal((d,)).astype(np.float32) * 0.01

    base = np.asarray(
        sla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                      topk_ratio=0.5))
    with_lin = np.asarray(
        sla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                      topk_ratio=0.5, proj_weight=jnp.asarray(w),
                      proj_bias=jnp.asarray(bias)))
    o_l = np.asarray(
        linear_attention(jnp.asarray(q).transpose(0, 2, 1, 3),
                         jnp.asarray(k).transpose(0, 2, 1, 3),
                         jnp.asarray(v).transpose(0, 2, 1, 3)))
    expected = base + (o_l @ w + bias).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(with_lin, expected, atol=3e-5, rtol=3e-4)


def test_sla_backend_selector():
    from fastvideo_tpu.attention.selector import get_attn_backend

    be = get_attn_backend(2, 64, supported=("SLA_ATTN",))
    assert be.name == "SLA_ATTN"
