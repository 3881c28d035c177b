"""Int8 W8A8 linear: quantized output close to fp32; model conversion."""

import numpy as np


def test_int8_linear_accuracy():
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.layers.linear import Linear
    from fastvideo_tpu.layers.quantization import Int8Linear

    lin = Linear(64, 96, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    q8 = Int8Linear.from_linear(lin)
    wo = Int8Linear.from_linear(lin, weight_only=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 10, 64)), dtype=jnp.float32)
    ref = np.asarray(lin(x))
    out = np.asarray(q8(x))
    out_wo = np.asarray(wo(x))
    scale = np.abs(ref).max()
    assert np.abs(ref - out).max() / scale < 0.03
    assert np.abs(ref - out_wo).max() / scale < 0.02


def test_quantize_wan_model():
    import jax.numpy as jnp
    from flax import nnx

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.layers.quantization import quantize_model_linears
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel

    par.destroy_mesh()
    par.maybe_init_mesh(par.MeshConfig(1, 1, 1))
    cfg = WanArchConfig(num_attention_heads=2, attention_head_dim=8,
                        in_channels=4, out_channels=4, text_dim=16,
                        freq_dim=16, ffn_dim=32, num_layers=1)
    model = WanTransformer3DModel(cfg, param_dtype=jnp.float32,
                                  rngs=nnx.Rngs(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 2, 8, 8)), dtype=jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 6, 16)), dtype=jnp.float32)
    t = jnp.asarray([500.0])
    ref = np.asarray(model(x, ctx, t))
    n = quantize_model_linears(model)
    # the measured W8A8 serving policy (QuantizationConfig docstring)
    # quantizes patch_embedding.proj, both attention out-projections, and
    # the two ffn linears of the single block; q/k/v + gate-compress are
    # kernel feeders (excluded), norms/embedders/proj_out are excluded.
    assert n == 5, n
    out = np.asarray(model(x, ctx, t))
    rel = np.abs(ref - out).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.15, rel
