"""VSA x SP equivalence: tile-major hoisting must commute with the Ulysses
sequence shard.

The flagship FastWan path runs VIDEO_SPARSE_ATTN with the tile permutation
hoisted to patch-embed (models/dits/wan.py) while SP shards the (tile-major)
token dim; this pins that the composition matches the sp=1 output exactly —
the round-3 VERDICT's untested cell of the parallelism matrix. Reference
semantics: attention/layer.py:122-162 (Ulysses a2a) +
backends/video_sparse_attn.py:28-60 (tile partition).
"""

import numpy as np
import pytest


def _build(monkeypatch, sparsity: float):
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel

    monkeypatch.setenv("FASTVIDEO_ATTENTION_BACKEND", "VIDEO_SPARSE_ATTN")
    # 4 heads so sp=4 still has a full head per device
    cfg = WanArchConfig(num_attention_heads=4, attention_head_dim=24,
                        in_channels=4, out_channels=4, text_dim=32,
                        freq_dim=32, ffn_dim=64, num_layers=2, text_len=16)
    model = WanTransformer3DModel(cfg, param_dtype=jnp.float32,
                                  rngs=nnx.Rngs(0))
    assert model.vsa_tiled_order, "VSA block must be active for this test"
    return model


@pytest.mark.parametrize("sp", [2, 4])
@pytest.mark.parametrize("sparsity", [0.0, 0.5])
def test_vsa_sp_matches_single(monkeypatch, sp, sparsity):
    import jax
    import jax.numpy as jnp

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.forward_context import (AttentionMetadata,
                                               set_forward_context)

    model = _build(monkeypatch, sparsity)
    rng = np.random.default_rng(0)
    # latent grid (t, h, w) = (4, 8, 8) tokens after 1x2x2 patching: exactly
    # one (4, 8, 8) TPU tile at sparsity 0 and a multi-tile grid at (4,16,16)
    shape = (1, 4, 4, 16, 16)
    x = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 16, 32)), dtype=jnp.float32)
    ts = jnp.asarray([500.0])
    meta = AttentionMetadata(extra={"VSA_sparsity": float(sparsity)})

    par.destroy_mesh()
    mesh1 = par.init_mesh(par.MeshConfig(1, 1, 1), devices=jax.devices()[:1])
    with par.mesh_context(mesh1), set_forward_context(attn_metadata=meta):
        ref = np.asarray(model(x, ctx, ts))
    meshN = par.init_mesh(par.MeshConfig(1, sp, 1),
                          devices=jax.devices()[:sp])
    with par.mesh_context(meshN), set_forward_context(attn_metadata=meta):
        out = np.asarray(model(x, ctx, ts))
    par.destroy_mesh()
    assert np.abs(ref - out).max() < 5e-5


def test_vsa_sp2_tp2_matches_single(monkeypatch):
    """VSA under a combined sp=2 x tp=2 inference mesh."""
    import jax
    import jax.numpy as jnp

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.forward_context import (AttentionMetadata,
                                               set_forward_context)

    model = _build(monkeypatch, 0.5)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 16, 16)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 16, 32)), jnp.float32)
    ts = jnp.asarray([500.0])
    meta = AttentionMetadata(extra={"VSA_sparsity": 0.5})

    par.destroy_mesh()
    mesh1 = par.init_mesh(par.MeshConfig(1, 1, 1), devices=jax.devices()[:1])
    with par.mesh_context(mesh1), set_forward_context(attn_metadata=meta):
        ref = np.asarray(model(x, ctx, ts))
    mesh22 = par.init_mesh(par.MeshConfig(1, 2, 2),
                           devices=jax.devices()[:4])
    with par.mesh_context(mesh22), set_forward_context(attn_metadata=meta):
        out = np.asarray(model(x, ctx, ts))
    par.destroy_mesh()
    assert np.abs(ref - out).max() < 5e-5
