"""Tests for the exact-divide VSA path: geometry selection, reshape-based
tile permutation, the flash-style BlockSpec-gather kernel, and the
hoisted-permutation (pre_tiled) model mode."""

import numpy as np
import pytest


def test_select_vsa_tile_exact_divide():
    from fastvideo_tpu.ops.vsa import select_vsa_tile

    # bench grid: Wan 480p x 81f -> (21, 30, 52)
    tile = select_vsa_tile((21, 30, 52))
    assert tile is not None
    assert all(g % t == 0 for g, t in zip((21, 30, 52), tile))
    elems = tile[0] * tile[1] * tile[2]
    assert elems % 8 == 0 and 128 <= elems <= 640

    # 720p x 81f -> (21, 45, 80)
    tile = select_vsa_tile((21, 45, 80))
    assert tile is not None
    assert all(g % t == 0 for g, t in zip((21, 45, 80), tile))

    # prime-ish grid with no divisor-based tiles
    assert select_vsa_tile((1, 7, 11)) is None


def test_tile_exact_matches_scatter_layout():
    import jax.numpy as jnp

    from fastvideo_tpu.ops.vsa import (tile_tokens, tile_tokens_exact,
                                       untile_tokens_exact)

    rng = np.random.default_rng(0)
    grid, tile = (4, 6, 8), (2, 3, 4)
    x = jnp.asarray(rng.standard_normal((2, 4 * 6 * 8, 5)))
    fast = tile_tokens_exact(x, grid, tile)
    slow = tile_tokens(x, grid, tile)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow))
    back = untile_tokens_exact(fast, grid, tile)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_fast_kernel_matches_reference():
    import jax.numpy as jnp

    from fastvideo_tpu.ops.vsa import (_sparse_attention_reference,
                                       block_sparse_attention_fast)

    rng = np.random.default_rng(1)
    B, H, D, E = 1, 2, 64, 24
    nb = 6
    s = nb * E
    q = jnp.asarray(rng.standard_normal((B, H, s, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, s, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, s, D)), jnp.float32)
    topk = 3
    idx = np.stack([
        rng.choice(nb, size=topk, replace=False) for _ in range(B * H * nb)
    ]).reshape(B, H, nb, topk).astype(np.int32)
    scale = 1.0 / np.sqrt(D)
    sizes = jnp.full((nb,), E, jnp.int32)
    ref = _sparse_attention_reference(q, k, v, jnp.asarray(idx), sizes, scale,
                                      tile_elems=E)
    out = block_sparse_attention_fast(q, k, v, jnp.asarray(idx), scale=scale,
                                      tile_elems=E)
    err = float(jnp.abs(ref - out).max())
    assert err < 2e-2, err


def test_fast_kernel_grouped_with_tail_padding():
    """Regression: with q_group > 1 (q block wider than a KV tile) AND
    topk % unroll != 0, the duplicate-padded tail chunks must be masked
    by KV-tile width, not query-block width."""
    import jax.numpy as jnp

    from fastvideo_tpu.ops.vsa import (_sparse_attention_reference,
                                       block_sparse_attention_fast)

    rng = np.random.default_rng(7)
    B, H, D, E = 1, 1, 64, 16
    nb, group = 8, 2
    ng = nb // group
    s = nb * E
    q = jnp.asarray(rng.standard_normal((B, H, s, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, s, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, s, D)), jnp.float32)
    topk = 3  # with unroll=2 -> nsteps=2, pad=1 duplicate tail chunk
    idx_g = np.stack([
        rng.choice(nb, size=topk, replace=False) for _ in range(B * H * ng)
    ]).reshape(B, H, ng, topk).astype(np.int32)
    scale = 1.0 / np.sqrt(D)
    sizes = jnp.full((nb,), E, jnp.int32)
    # reference works per query tile: expand group indices to tiles
    idx_t = np.repeat(idx_g, group, axis=2)
    ref = _sparse_attention_reference(q, k, v, jnp.asarray(idx_t), sizes,
                                      scale, tile_elems=E)
    out = block_sparse_attention_fast(q, k, v, jnp.asarray(idx_g),
                                      scale=scale, tile_elems=E, unroll=2)
    err = float(jnp.abs(ref - out).max())
    assert err < 2e-2, err


def test_q_grouped_selection_matches_expanded():
    """q_group>1 must equal per-tile selection with group-averaged scores
    expanded back to every tile (same math, one shared set per group)."""
    import jax.numpy as jnp

    from fastvideo_tpu.ops.vsa import video_sparse_attn

    rng = np.random.default_rng(4)
    B, H, D, E, nb = 1, 2, 32, 16, 8
    s = nb * E
    q = jnp.asarray(rng.standard_normal((B, H, s, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, s, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, s, D)), jnp.float32)
    sizes = jnp.full((nb,), E, jnp.int32)

    out_g = video_sparse_attn(q, k, v, sizes, topk=2, tile_elems=E,
                              full_tiles=True, q_group=2)

    # manual expansion reference: average coarse scores over pairs of tiles
    from fastvideo_tpu.ops.vsa import (_sparse_attention_reference,
                                       block_mean)
    scale = 1.0 / np.sqrt(D)
    q_c = block_mean(q, sizes, E)
    k_c = block_mean(k, sizes, E)
    v_c = block_mean(v, sizes, E)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q_c.astype(jnp.float32),
                        k_c.astype(jnp.float32)) * scale
    import jax
    attn = jax.nn.softmax(scores, axis=-1)
    out_c = jnp.einsum("bhqk,bhkd->bhqd", attn,
                       v_c.astype(jnp.float32)).astype(q.dtype)
    out_c = jnp.repeat(out_c, E, axis=2)
    sg = scores.reshape(B, H, nb // 2, 2, nb).mean(axis=3)
    _, idx = jax.lax.top_k(sg, 2)
    idx_tiles = jnp.repeat(idx, 2, axis=2)
    out_s = _sparse_attention_reference(q, k, v, idx_tiles, sizes, scale, E)
    ref = out_c + out_s
    assert float(jnp.abs(out_g - ref).max()) < 2e-2


def test_vsa_full_tiles_grad_path():
    """full_tiles composition must be differentiable (VJP via the manual
    LSE kernels) and match the non-fast path."""
    import jax
    import jax.numpy as jnp

    from fastvideo_tpu.ops.vsa import video_sparse_attn

    rng = np.random.default_rng(2)
    B, H, D, E, nb = 1, 1, 32, 16, 4
    s = nb * E
    q = jnp.asarray(rng.standard_normal((B, H, s, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, s, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, s, D)), jnp.float32)
    sizes = jnp.full((nb,), E, jnp.int32)

    out_fast = video_sparse_attn(q, k, v, sizes, topk=2, tile_elems=E,
                                 full_tiles=True)
    out_slow = video_sparse_attn(q, k, v, sizes, topk=2, tile_elems=E,
                                 full_tiles=False)
    assert float(jnp.abs(out_fast - out_slow).max()) < 2e-2

    def loss(q_):
        return jnp.sum(video_sparse_attn(q_, k, v, sizes, topk=2,
                                         tile_elems=E, full_tiles=True) ** 2)

    g_fast = jax.grad(loss)(q)

    def loss_slow(q_):
        return jnp.sum(video_sparse_attn(q_, k, v, sizes, topk=2,
                                         tile_elems=E, full_tiles=False) ** 2)

    g_slow = jax.grad(loss_slow)(q)
    assert float(jnp.abs(g_fast - g_slow).max()) < 5e-2


@pytest.mark.parametrize("latent_shape", [
    (2, 8, 12),   # token grid (2, 4, 6): no exact tile -> masked pad path
    (4, 16, 32),  # token grid (4, 8, 16): exact tile -> fast kernel path
])
def test_wan_pre_tiled_matches_per_layer_path(monkeypatch, latent_shape):
    """Hoisted tile permutation (model in tile-major order) must reproduce
    the per-layer tile/untile path exactly."""
    import jax.numpy as jnp
    from flax import nnx

    monkeypatch.setenv("FASTVIDEO_ATTENTION_BACKEND", "VIDEO_SPARSE_ATTN")

    from fastvideo_tpu.attention.backends.abstract import AttentionMetadata
    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.forward_context import set_forward_context
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel

    cfg = WanArchConfig(num_attention_heads=2, attention_head_dim=32,
                        in_channels=4, out_channels=4, text_dim=16,
                        freq_dim=32, ffn_dim=32, num_layers=2,
                        patch_size=(1, 2, 2))
    model = WanTransformer3DModel(cfg, param_dtype=jnp.float32,
                                  rngs=nnx.Rngs(0))
    assert model.vsa_tiled_order

    rng = np.random.default_rng(3)
    t_, h_, w_ = latent_shape
    x = jnp.asarray(rng.standard_normal((1, 4, t_, h_, w_)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 5, 16)), jnp.float32)
    t = jnp.full((1,), 500.0, jnp.float32)
    md = AttentionMetadata(extra={"VSA_sparsity": 0.5})

    with set_forward_context(attn_metadata=md):
        out_tiled = model(x, ctx, t)
        model.vsa_tiled_order = False
        out_layerwise = model(x, ctx, t)
    err = float(jnp.abs(out_tiled - out_layerwise).max())
    assert err < 2e-3, err
