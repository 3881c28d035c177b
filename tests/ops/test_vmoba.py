"""VMOBA numeric tests vs dense reference math (reference
fastvideo-kernel/vmoba.py:570-900 semantics)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(5)
    t, h, w = 4, 4, 4
    B, S, H, D = 1, t * h * w, 2, 16
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    return (t, h, w), q, k, v


def _dense_union_reference(q, k, v, mask, chunk_len):
    """softmax over keys in the union of selected chunks per token."""
    b, s, h, d = q.shape
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    scores = (qt @ kt.transpose(0, 1, 3, 2)) / np.sqrt(d)
    tok_mask = np.repeat(mask, chunk_len, axis=-1)  # [B,H,S,S]
    scores = np.where(tok_mask, scores, -np.inf)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return (p @ vt).transpose(0, 2, 1, 3)


def test_vmoba_temporal_threshold_matches_dense_masked(data):
    import jax.numpy as jnp

    from fastvideo_tpu.ops.vmoba import (chunk_reorder, vmoba_attention,
                                         vmoba_gate_mask)

    (t, h, w), q, k, v = data
    chunk_size = 1  # temporal: one frame per chunk
    got = np.asarray(
        vmoba_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        patch_resolution=(t, h, w), chunk_size=chunk_size,
                        select_mode="threshold", threshold=0.3))
    qc, chunk_len = chunk_reorder(jnp.asarray(q), (t, h, w), chunk_size)
    kc, _ = chunk_reorder(jnp.asarray(k), (t, h, w), chunk_size)
    mask = np.asarray(
        vmoba_gate_mask(qc, kc, chunk_len, 4, "threshold", 0.3))
    ref = _dense_union_reference(q, k, v, mask, chunk_len)
    np.testing.assert_allclose(got, ref.astype(np.float32), atol=3e-5,
                               rtol=3e-4)


def test_vmoba_topk_includes_self_chunk(data):
    import jax.numpy as jnp

    from fastvideo_tpu.ops.vmoba import chunk_reorder, vmoba_gate_mask

    (t, h, w), q, k, v = data
    qc, chunk_len = chunk_reorder(jnp.asarray(q), (t, h, w), 1)
    kc, _ = chunk_reorder(jnp.asarray(k), (t, h, w), 1)
    mask = np.asarray(vmoba_gate_mask(qc, kc, chunk_len, 2, "topk"))
    s = q.shape[1]
    nc = s // chunk_len
    tok_chunk = np.arange(s) // chunk_len
    # every token keeps its own chunk, and exactly topk selections
    for c in range(nc):
        assert mask[:, :, tok_chunk == c, c].all()
    assert (mask.sum(-1) <= 2 + 1).all()  # topk (incl self amp) + self


def test_vmoba_all_chunks_equals_dense(data):
    import jax
    import jax.numpy as jnp

    from fastvideo_tpu.ops.vmoba import vmoba_attention

    (t, h, w), q, k, v = data
    out = np.asarray(
        vmoba_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        patch_resolution=(t, h, w), chunk_size=1,
                        select_mode="threshold", threshold=1.0))
    dense = np.asarray(
        jax.nn.dot_product_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v)))
    np.testing.assert_allclose(out, dense, atol=3e-5, rtol=3e-4)


def test_vmoba_spatial_and_st_reorders_roundtrip(data):
    import jax.numpy as jnp

    from fastvideo_tpu.ops.vmoba import chunk_reorder, chunk_restore

    (t, h, w), q, _, _ = data
    for cs in [(2, 2), (2, 2, 2)]:
        y, clen = chunk_reorder(jnp.asarray(q), (t, h, w), cs)
        back = np.asarray(chunk_restore(y, (t, h, w), cs))
        np.testing.assert_array_equal(back, q)
        expected = (t * cs[0] * cs[1] if len(cs) == 2 else
                    cs[0] * cs[1] * cs[2])
        assert clen == expected


def test_vmoba_backend_selector():
    from fastvideo_tpu.attention.selector import get_attn_backend

    be = get_attn_backend(2, 64, supported=("VMOBA_ATTN",))
    assert be.name == "VMOBA_ATTN"
