"""VSA numeric tests (CPU: pallas interpret-equivalent paths).

Mirrors /root/reference/fastvideo-kernel/tests/test_vsa.py: sparse branch
vs dense-math reference, full composition at sparsity 0 vs dense attention.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def data():
    import jax.numpy as jnp

    from fastvideo_tpu.ops.vsa import tile_layout, tile_tokens

    rng = np.random.default_rng(0)
    dit_shape = (3, 6, 7)  # -> tiles (1, 2, 2) = 4 tiles, ragged
    s = 3 * 6 * 7
    B, H, D = 1, 2, 64
    q = rng.standard_normal((B, s, H, D)).astype(np.float32)
    k = rng.standard_normal((B, s, H, D)).astype(np.float32)
    v = rng.standard_normal((B, s, H, D)).astype(np.float32)

    def to_tiled_bhsd(x):
        t = tile_tokens(jnp.asarray(x), dit_shape)  # [B, S_pad, H, D]
        return t.transpose(0, 2, 1, 3)

    _, _, block_sizes, _, _ = tile_layout(dit_shape)
    return dit_shape, to_tiled_bhsd(q), to_tiled_bhsd(k), to_tiled_bhsd(
        v), jnp.asarray(block_sizes)


def test_sparse_branch_matches_reference(data):
    import jax.numpy as jnp

    from fastvideo_tpu.ops.vsa import (_sparse_attention_reference,
                                       block_sparse_attention)

    _, q, k, v, sizes = data
    nb = q.shape[2] // 64
    rng = np.random.default_rng(1)
    topk = 2
    idx = np.stack([
        rng.choice(nb, size=topk, replace=False)
        for _ in range(q.shape[0] * q.shape[1] * nb)
    ]).reshape(q.shape[0], q.shape[1], nb, topk).astype(np.int32)
    idx = jnp.asarray(idx)
    scale = 1.0 / np.sqrt(q.shape[-1])
    ref = _sparse_attention_reference(q, k, v, idx, sizes, scale)
    out = block_sparse_attention(q, k, v, idx, sizes, scale=scale)
    # compare only valid (non-padded) rows
    err = float(jnp.abs(ref - out).max())
    assert err < 2e-2, err  # bf16-grade MXU tolerance


def test_full_vsa_sparsity0_equals_dense(data):
    """topk = all tiles -> sparse branch == dense attention over valid toks."""
    import jax
    import jax.numpy as jnp

    from fastvideo_tpu.ops.vsa import TILE_ELEMS, video_sparse_attn

    _, q, k, v, sizes = data
    nb = q.shape[2] // TILE_ELEMS
    out = video_sparse_attn(q, k, v, sizes, topk=nb, gate_compress=None,
                            use_pallas=True)
    out_ref = video_sparse_attn(q, k, v, sizes, topk=nb, gate_compress=None,
                                use_pallas=False)
    err = float(jnp.abs(out - out_ref).max())
    assert err < 2e-2, err

    # and the sparse part alone must equal full dense attention on valid toks
    col_tile = jnp.arange(q.shape[2]) // TILE_ELEMS
    valid = (jnp.arange(q.shape[2]) % TILE_ELEMS) < sizes[col_tile]
    mask = valid[None, None, None, :]
    dense = jax.nn.dot_product_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), mask=mask).transpose(0, 2, 1, 3)
    from fastvideo_tpu.ops.vsa import _sparse_attention_reference

    idx = jnp.broadcast_to(jnp.arange(nb)[None, None, None, :],
                           (q.shape[0], q.shape[1], nb, nb)).astype(jnp.int32)
    sp = _sparse_attention_reference(q, k, v, idx, sizes,
                                     1.0 / np.sqrt(q.shape[-1]))
    rows = np.asarray(valid)
    err = float(jnp.abs(sp[:, :, rows] - dense[:, :, rows]).max())
    assert err < 2e-2, err


def test_tile_untile_roundtrip():
    import jax.numpy as jnp

    from fastvideo_tpu.ops.vsa import tile_tokens, untile_tokens

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 3 * 6 * 7, 5)))
    t = tile_tokens(x, (3, 6, 7))
    back = untile_tokens(t, (3, 6, 7))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))
