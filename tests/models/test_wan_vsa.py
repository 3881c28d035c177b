"""Wan with VIDEO_SPARSE_ATTN backend: forward runs, gate block selected."""

import numpy as np
import pytest


def test_wan_vsa_forward(monkeypatch):
    monkeypatch.setenv("FASTVIDEO_ATTENTION_BACKEND", "VIDEO_SPARSE_ATTN")
    import jax.numpy as jnp
    from flax import nnx

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.attention.backends.abstract import AttentionMetadata
    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.forward_context import set_forward_context
    from fastvideo_tpu.models.dits.wan import (WanTransformer3DModel,
                                               WanTransformerBlockVSA)

    par.destroy_mesh()
    par.maybe_init_mesh(par.MeshConfig(dp_size=1, sp_size=1, tp_size=1))
    cfg = WanArchConfig(num_attention_heads=2, attention_head_dim=8,
                        in_channels=4, out_channels=4, text_dim=16,
                        freq_dim=16, ffn_dim=32, num_layers=1)
    model = WanTransformer3DModel(cfg, param_dtype=jnp.float32,
                                  rngs=nnx.Rngs(0))
    assert isinstance(model.blocks[0], WanTransformerBlockVSA)
    assert hasattr(model.blocks[0], "to_gate_compress")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 16, 16)),
                    dtype=jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 6, 16)), dtype=jnp.float32)
    t = jnp.asarray([500.0])
    meta = AttentionMetadata(extra={"VSA_sparsity": 0.5})
    with set_forward_context(current_timestep=0, attn_metadata=meta):
        out = model(x, ctx, t)
    assert out.shape == (1, 4, 4, 16, 16)
    assert np.isfinite(np.asarray(out)).all()
