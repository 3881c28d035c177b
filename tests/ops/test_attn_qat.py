"""QAT attention tests: fake-quant fidelity, STE gradients, backend wiring
(reference attention/backends/attn_qat_train.py semantics)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(17)
    B, S, H, D = 1, 128, 2, 32
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    return q, k, v


def test_fake_quant_roundtrip_accuracy():
    import jax.numpy as jnp

    from fastvideo_tpu.ops.attn_qat import fake_quant_blockwise

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 128, 2, 32)).astype(np.float32)
    xq = np.asarray(fake_quant_blockwise(jnp.asarray(x)))
    # int8 per-block grid: relative error bounded by ~amax/127 per block
    err = np.abs(xq - x)
    assert err.max() <= np.abs(x).max() / 127 + 1e-6
    assert not np.array_equal(xq, x)  # actually quantized


def test_qat_attention_close_to_dense(data):
    import jax
    import jax.numpy as jnp

    from fastvideo_tpu.ops.attn_qat import qat_attention

    q, k, v = data
    out = np.asarray(qat_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v)))
    dense = np.asarray(
        jax.nn.dot_product_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v)))
    # int8 fake quant: close but not equal
    assert np.abs(out - dense).max() < 0.15
    assert np.abs(out - dense).max() > 1e-6


def test_qat_attention_ste_gradients(data):
    import jax
    import jax.numpy as jnp

    from fastvideo_tpu.ops.attn_qat import qat_attention

    q, k, v = data

    def loss(q, k, v):
        return jnp.sum(jnp.square(qat_attention(q, k, v)))

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(jnp.asarray(q),
                                                   jnp.asarray(k),
                                                   jnp.asarray(v))
    for g in (gq, gk, gv):
        g = np.asarray(g)
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0

    # STE: gradients approximate the dense-attention gradients
    def dense_loss(q, k, v):
        return jnp.sum(
            jnp.square(jax.nn.dot_product_attention(q, k, v)))

    dgq = np.asarray(jax.grad(dense_loss)(jnp.asarray(q), jnp.asarray(k),
                                          jnp.asarray(v)))
    cos = np.sum(np.asarray(gq) * dgq) / (
        np.linalg.norm(gq) * np.linalg.norm(dgq))
    assert cos > 0.95, cos


def test_qat_pad_and_backend(data):
    import jax.numpy as jnp

    from fastvideo_tpu.attention.selector import get_attn_backend
    from fastvideo_tpu.ops.attn_qat import qat_attention

    q, k, v = data
    # ragged sequence pads internally
    out = np.asarray(qat_attention(jnp.asarray(q[:, :100]),
                                   jnp.asarray(k[:, :100]),
                                   jnp.asarray(v[:, :100])))
    assert out.shape == (1, 100, 2, 32)
    assert np.isfinite(out).all()

    be = get_attn_backend(2, 32, supported=("ATTN_QAT_TRAIN",))
    assert be.name == "ATTN_QAT_TRAIN"
    # serving alias resolves to the int8 SAGE path
    be2 = get_attn_backend(2, 32, requested="ATTN_QAT")
    assert be2.name == "SAGE_ATTN"
