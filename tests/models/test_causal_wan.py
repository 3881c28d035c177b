"""Causal Wan: rolling-cache attention equivalence + block forward smoke."""

import numpy as np
import pytest


def _dense_blockwise(q, k, v, block, scale):
    """Dense attention with blockwise-causal mask (reference
    causal_wanvideo.py:_prepare_blockwise_causal_attn_mask)."""
    import jax
    import jax.numpy as jnp

    s = q.shape[1]
    blk = np.arange(s) // block
    mask = (blk[None, :] <= blk[:, None])[None, None]
    return jax.nn.dot_product_attention(q, k, v, mask=jnp.asarray(mask),
                                        scale=scale)


def test_cached_attention_matches_dense_blockwise():
    import jax.numpy as jnp

    from fastvideo_tpu.models.dits.causal_wan import (cached_self_attention,
                                                      init_layer_cache)

    rng = np.random.default_rng(0)
    B, S, H, D = 1, 48, 2, 16
    block = 12
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype=jnp.float32)
    scale = D**-0.5
    ref = _dense_blockwise(q, k, v, block, scale)

    cache = init_layer_cache(B, window_tokens=S, sink_tokens=0, num_heads=H,
                             head_dim=D, dtype=jnp.float32)
    outs = []
    for i in range(0, S, block):
        out, cache = cached_self_attention(q[:, i:i + block],
                                           k[:, i:i + block],
                                           v[:, i:i + block], cache, scale)
        outs.append(out)
    got = jnp.concatenate(outs, axis=1)
    err = float(jnp.abs(ref - got).max())
    assert err < 1e-5, err


def test_cached_attention_window_eviction():
    """With a small window, only the last W tokens are attended."""
    import jax.numpy as jnp

    from fastvideo_tpu.models.dits.causal_wan import (cached_self_attention,
                                                      init_layer_cache)

    rng = np.random.default_rng(1)
    B, H, D = 1, 2, 16
    block, W = 8, 16  # window keeps last 2 blocks
    S = 4 * block
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype=jnp.float32)
    scale = D**-0.5

    cache = init_layer_cache(B, W, 0, H, D, jnp.float32)
    outs = []
    for i in range(0, S, block):
        out, cache = cached_self_attention(q[:, i:i + block],
                                           k[:, i:i + block],
                                           v[:, i:i + block], cache, scale)
        outs.append(out)
    # last block attends only to blocks 3 and 4 (window = 2 blocks)
    import jax

    last_ref = jax.nn.dot_product_attention(q[:, -block:], k[:, -W:],
                                            v[:, -W:], scale=scale)
    err = float(jnp.abs(outs[-1] - last_ref).max())
    assert err < 1e-5, err


def test_cached_attention_sink_counts_each_token_once():
    """Reference semantics (causal_wanvideo.py:136-190): ONE
    local_attn_size budget with the sink frozen at the front — after
    rolling, the attended set is sink tokens + the most recent
    (window - sink) tokens, each exactly once."""
    import jax
    import jax.numpy as jnp

    from fastvideo_tpu.models.dits.causal_wan import (cached_self_attention,
                                                      init_layer_cache)

    rng = np.random.default_rng(2)
    B, H, D = 1, 2, 16
    block, W, sink = 8, 24, 8  # total budget 24 = sink 8 + rolling 16
    S = 5 * block
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype=jnp.float32)
    scale = D**-0.5

    cache = init_layer_cache(B, W, sink, H, D, jnp.float32)
    outs = []
    for i in range(0, S, block):
        out, cache = cached_self_attention(q[:, i:i + block],
                                           k[:, i:i + block],
                                           v[:, i:i + block], cache, scale)
        outs.append(out)
    # final block: sink tokens [0:8] + last 16 tokens, each ONCE
    keep = jnp.concatenate([k[:, :sink], k[:, S - (W - sink):]], axis=1)
    vals = jnp.concatenate([v[:, :sink], v[:, S - (W - sink):]], axis=1)
    ref = jax.nn.dot_product_attention(q[:, -block:], keep, vals,
                                       scale=scale)
    err = float(jnp.abs(outs[-1] - ref).max())
    assert err < 1e-5, err
    # pre-roll block (tokens 8..15 while stream is short): every past
    # token attended exactly once despite living in both buffers
    ref1 = jax.nn.dot_product_attention(q[:, block:2 * block],
                                        k[:, :2 * block], v[:, :2 * block],
                                        scale=scale)
    err1 = float(jnp.abs(outs[1] - ref1).max())
    assert err1 < 1e-5, err1


def test_causal_forward_block_smoke():
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.models.dits.causal_wan import (
        CausalWanTransformer3DModel)

    cfg = WanArchConfig(num_attention_heads=2, attention_head_dim=8,
                        in_channels=4, out_channels=4, text_dim=16,
                        freq_dim=16, ffn_dim=32, num_layers=2,
                        local_attn_size=-1, num_frames_per_block=2)
    model = CausalWanTransformer3DModel(cfg, param_dtype=jnp.float32,
                                        rngs=nnx.Rngs(0))
    rng = np.random.default_rng(0)
    frame_seqlen = 4 * 4  # 8x8 latent, patch (1,2,2)
    caches = model.init_caches(1, frame_seqlen, jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 6, 16)), dtype=jnp.float32)
    outs = []
    for blk in range(3):
        x = jnp.asarray(rng.standard_normal((1, 4, 2, 8, 8)),
                        dtype=jnp.float32)
        t = jnp.full((1,), 400.0, jnp.float32)
        pred, caches = model.forward_block(x, ctx, t, caches,
                                           start_frame=blk * 2)
        outs.append(np.asarray(pred))
        assert pred.shape == (1, 4, 2, 8, 8)
        assert np.isfinite(outs[-1]).all()
    assert int(caches[0]["global_end"]) == 3 * 2 * frame_seqlen
