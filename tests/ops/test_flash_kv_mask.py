"""flash_attention_kv_mask (dynamic per-key validity) matches dense bias
attention — the path the causal streaming KV cache rides
(models/dits/causal_wan.py cached_self_attention)."""

import numpy as np
import pytest


def _dense(q, k, v, ok, scale):
    import jax
    import jax.numpy as jnp

    neg = float(jnp.finfo(jnp.float32).min)
    bias = jnp.where(ok, 0.0, neg)[None, None, None, :]
    return jax.nn.dot_product_attention(q, k, v, bias=bias, scale=scale)


@pytest.mark.parametrize("mask_kind", ["suffix", "sink_plus_window", "full"])
def test_kv_mask_matches_dense(mask_kind):
    import jax
    import jax.numpy as jnp

    from fastvideo_tpu.ops.flash_attention import flash_attention_kv_mask

    rng = np.random.default_rng(3)
    B, SQ, SKV, H, D = 1, 192, 1536, 2, 128
    q = jnp.asarray(rng.standard_normal((B, SQ, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, SKV, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, SKV, H, D)), jnp.float32)
    pos = np.arange(SKV)
    if mask_kind == "suffix":
        # early stream: only the tail of the window is populated — the
        # leading KV tiles are FULLY masked (exercises the online-softmax
        # self-correction when m starts at the mask value)
        ok = pos >= SKV - 200
    elif mask_kind == "sink_plus_window":
        ok = (pos < 96) | (pos >= 700)
    else:
        ok = np.ones(SKV, bool)
    okj = jnp.asarray(ok)
    scale = D**-0.5

    out = flash_attention_kv_mask(q, k, v, okj, scale=scale,
                                  block_q=128, block_kv=256)
    ref = _dense(q, k, v, okj, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    # mask values are traced: jitting over different fill counters reuses
    # one executable (the whole point vs the static structural masks)
    traces = []

    @jax.jit
    def fwd(m):
        traces.append(1)
        return flash_attention_kv_mask(q, k, v, m, scale=scale,
                                       block_q=128, block_kv=256)

    for thresh in (100, 900):
        m = jnp.asarray(pos >= thresh)
        np.testing.assert_allclose(np.asarray(fwd(m)),
                                   np.asarray(_dense(q, k, v, m, scale)),
                                   atol=2e-5, rtol=2e-5)
    assert len(traces) == 1


def test_cached_self_attention_flash_path_matches_dense():
    """cached_self_attention above the flash threshold equals the dense
    bias formula it replaced (same cache, same mask semantics)."""
    import jax
    import jax.numpy as jnp

    from fastvideo_tpu.models.dits.causal_wan import (cached_self_attention,
                                                      init_layer_cache)

    B, H, D = 1, 1, 128
    n = 128                      # tokens per block
    window, sink = 1024, 128     # total kv = 1152 >= flash threshold
    rng = np.random.default_rng(0)
    cache = init_layer_cache(B, window + sink, sink, H, D, jnp.float32)
    outs = []
    for blk in range(3):
        q = jnp.asarray(rng.standard_normal((B, n, H, D)), jnp.float32)
        kv = jnp.asarray(rng.standard_normal((2, B, n, H, D)), jnp.float32)
        out, cache = cached_self_attention(q, kv[0], kv[1], cache,
                                           scale=D**-0.5)
        outs.append((q, kv, out))

    # replay against a cache-free dense recomputation of the same stream
    all_k = jnp.concatenate([kv[0] for _, kv, _ in outs], axis=1)
    all_v = jnp.concatenate([kv[1] for _, kv, _ in outs], axis=1)
    for blk, (q, kv, out) in enumerate(outs):
        end = (blk + 1) * n
        ref = jax.nn.dot_product_attention(q, all_k[:, :end], all_v[:, :end],
                                           scale=D**-0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=3e-5)
