"""scan_layers: lax.scan over stacked blocks == python loop, exactly."""

import numpy as np


def test_scan_layers_matches_loop():
    import jax.numpy as jnp
    from flax import nnx

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel

    par.destroy_mesh()
    cfg = WanArchConfig(num_attention_heads=2, attention_head_dim=8,
                        in_channels=4, out_channels=4, text_dim=16,
                        freq_dim=16, ffn_dim=32, num_layers=3)
    model = WanTransformer3DModel(cfg, param_dtype=jnp.float32,
                                  rngs=nnx.Rngs(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 3, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 6, 16)), jnp.float32)
    t = jnp.asarray([400.0], jnp.float32)

    out_loop = np.asarray(model(x, ctx, t))
    model.scan_layers = True
    out_scan = np.asarray(model(x, ctx, t))
    np.testing.assert_allclose(out_scan, out_loop, atol=1e-6)

    # remat path under scan
    model.gradient_checkpointing = True
    out_scan_ckpt = np.asarray(model(x, ctx, t))
    np.testing.assert_allclose(out_scan_ckpt, out_loop, atol=1e-6)
