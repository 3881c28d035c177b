"""VSA backward Pallas kernels: gradients match the dense-math reference."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup():
    import jax
    import jax.numpy as jnp

    from fastvideo_tpu.ops.vsa import tile_layout

    b, h, d = 1, 2, 32
    tile_elems = 8
    dit_shape = (2, 4, 5)  # ragged: W=5 with ws tiles -> padded tiles
    _, _, sizes, ntiles, padded = tile_layout(dit_shape, (2, 2, 2))
    nb = padded // tile_elems
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, padded, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, padded, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, padded, d)), jnp.float32)
    topk = 3
    idx = np.zeros((b, h, nb, topk), np.int32)
    for bb in range(b):
        for hh in range(h):
            for qq in range(nb):
                idx[bb, hh, qq] = rng.choice(nb, topk, replace=False)
    # include a sentinel slot on one row
    idx[0, 0, 0, -1] = -1
    return (q, k, v, jnp.asarray(idx), jnp.asarray(sizes), tile_elems, nb)


def test_vsa_forward_lse_matches_plain(setup):
    import jax.numpy as jnp

    from fastvideo_tpu.ops.vsa import (block_sparse_attention,
                                       block_sparse_attention_trainable)

    q, k, v, idx, sizes, tile_elems, nb = setup
    out_plain = block_sparse_attention(q, k, v, idx, sizes,
                                       tile_elems=tile_elems)
    out_vjp = block_sparse_attention_trainable(q, k, v, idx, sizes,
                                               tile_elems=tile_elems)
    np.testing.assert_allclose(np.asarray(out_vjp), np.asarray(out_plain),
                               atol=1e-5)


def test_vsa_backward_matches_reference_grads(setup):
    import jax
    import jax.numpy as jnp

    from fastvideo_tpu.ops.vsa import (_sparse_attention_reference,
                                       block_sparse_attention_trainable)

    q, k, v, idx, sizes, tile_elems, nb = setup
    scale = 1.0 / np.sqrt(q.shape[-1])

    def loss_kernel(q, k, v):
        out = block_sparse_attention_trainable(q, k, v, idx, sizes,
                                               tile_elems=tile_elems)
        return jnp.sum(out.astype(jnp.float32) * weights)

    def loss_ref(q, k, v):
        out = _sparse_attention_reference(q, k, v, idx, sizes, scale,
                                          tile_elems)
        return jnp.sum(out.astype(jnp.float32) * weights)

    rng = np.random.default_rng(1)
    weights = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)

    g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, gk, gr in zip("qkv", g_kernel, g_ref):
        err = np.abs(np.asarray(gk) - np.asarray(gr)).max()
        denom = np.abs(np.asarray(gr)).max() + 1e-6
        assert err / denom < 2e-4, f"d{name} rel err {err/denom}"
