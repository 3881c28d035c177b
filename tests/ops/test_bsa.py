"""BSA numeric tests vs dense reference math (reference
attention/backends/bsa_attn.py:88-533 semantics)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    B, S, H, D = 1, 4 * 64, 2, 64
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    return q, k, v


def test_bsa_no_sparsity_equals_dense(data):
    """keep_ratio=1 + threshold=1 (all kv blocks) must equal dense."""
    import jax
    import jax.numpy as jnp

    from fastvideo_tpu.ops.bsa import bsa_attention

    q, k, v = data
    out = np.asarray(
        bsa_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                      query_keep_ratio=1.0, kv_cumulative_threshold=1.0,
                      min_kv_blocks=4))
    dense = np.asarray(
        jax.nn.dot_product_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v)))
    np.testing.assert_allclose(out, dense, atol=2e-5, rtol=2e-4)


def _reference_bsa(q, k, v, keep_ratio, thr, min_blocks):
    """numpy port of the reference's pure-torch path."""
    b, s, h, d = q.shape
    n, blk = s // 64, 64
    qb = q.transpose(0, 2, 1, 3).reshape(b, h, n, blk, d)
    kb = k.transpose(0, 2, 1, 3).reshape(b, h, n, blk, d)
    vb = v.transpose(0, 2, 1, 3).reshape(b, h, n, blk, d)

    keep = max(1, int(blk * keep_ratio))
    center = qb[:, :, :, blk // 2:blk // 2 + 1]
    qn = qb / np.linalg.norm(qb, axis=-1, keepdims=True)
    cn = center / np.linalg.norm(center, axis=-1, keepdims=True)
    sim = (qn * cn).sum(-1)
    keep_idx = np.sort(np.argsort(sim, axis=-1)[..., :keep], axis=-1)
    sparse_q = np.take_along_axis(qb, keep_idx[..., None], axis=3)

    q_repr = sparse_q.mean(3)
    k_repr = kb.mean(3)
    scores = (q_repr @ k_repr.transpose(0, 1, 3, 2)) / np.sqrt(d)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    order = np.argsort(-p, axis=-1)
    sp = np.take_along_axis(p, order, axis=-1)
    cs = np.cumsum(sp, axis=-1)
    keep_sorted = np.ones_like(cs, bool)
    keep_sorted[..., 1:] = cs[..., :-1] < thr
    keep_sorted[..., :min_blocks] = True
    kv_mask = np.zeros_like(keep_sorted)
    np.put_along_axis(kv_mask, order, keep_sorted, axis=-1)

    out = np.zeros_like(sparse_q)
    for bi in range(b):
        for hi in range(h):
            for qi in range(n):
                sel = np.nonzero(kv_mask[bi, hi, qi])[0]
                sk = kb[bi, hi, sel].reshape(-1, d)
                sv = vb[bi, hi, sel].reshape(-1, d)
                sc = sparse_q[bi, hi, qi] @ sk.T / np.sqrt(d)
                w = np.exp(sc - sc.max(-1, keepdims=True))
                w = w / w.sum(-1, keepdims=True)
                out[bi, hi, qi] = w @ sv

    full = np.zeros((b, h, n, blk, d), out.dtype)
    pos = np.arange(blk)
    for bi in range(b):
        for hi in range(h):
            for qi in range(n):
                kept = keep_idx[bi, hi, qi]
                nearest = np.abs(pos[:, None] - kept[None]).argmin(1)
                full[bi, hi, qi] = out[bi, hi, qi, nearest]
    return full.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def test_bsa_matches_reference_math(data):
    import jax.numpy as jnp

    from fastvideo_tpu.ops.bsa import bsa_attention

    q, k, v = data
    got = np.asarray(
        bsa_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                      query_keep_ratio=0.5, kv_cumulative_threshold=0.8,
                      min_kv_blocks=1))
    ref = _reference_bsa(q, k, v, 0.5, 0.8, 1)
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=3e-4)


def test_bsa_backend_selector():
    from fastvideo_tpu.attention.selector import get_attn_backend

    be = get_attn_backend(2, 64, supported=("BSA_ATTN",))
    assert be.name == "BSA_ATTN"
