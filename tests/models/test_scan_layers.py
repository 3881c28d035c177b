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


def test_t5_scan_matches_loop():
    """UMT5 layer scan == unrolled loop, exactly (scan is the deep-encoder
    default; FASTVIDEO_T5_SCAN forces)."""
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    from fastvideo_tpu.configs.models.encoders.t5 import T5ArchConfig
    from fastvideo_tpu.models.encoders.t5 import T5EncoderModel

    cfg = T5ArchConfig(vocab_size=64, d_model=32, d_kv=8, d_ff=64,
                       num_layers=3, num_heads=4,
                       relative_attention_num_buckets=8,
                       relative_attention_max_distance=16,
                       feed_forward_proj="gated-gelu", is_umt5=True)
    enc = T5EncoderModel(cfg, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    ids = jnp.arange(12, dtype=jnp.int32)[None] % 64
    mask = jnp.ones((1, 12), jnp.int32)
    enc.scan_layers = True
    scanned = np.asarray(enc(ids, mask).last_hidden_state)
    enc.scan_layers = False
    looped = np.asarray(enc(ids, mask).last_hidden_state)
    np.testing.assert_allclose(scanned, looped, rtol=0, atol=1e-5)


def test_t5_scan_default_policy(monkeypatch):
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.encoders.t5 import T5ArchConfig
    from fastvideo_tpu.models.encoders.t5 import T5EncoderModel

    def mk(layers):
        return T5EncoderModel(
            T5ArchConfig(vocab_size=64, d_model=32, d_kv=8, d_ff=64,
                         num_layers=layers, num_heads=4,
                         relative_attention_num_buckets=8,
                         relative_attention_max_distance=16,
                         feed_forward_proj="gated-gelu", is_umt5=True),
            param_dtype=jnp.float32, rngs=nnx.Rngs(0))

    assert mk(4).scan_layers is False   # shallow: unrolled caches better
    assert mk(8).scan_layers is True    # deep: compile scales with depth
    monkeypatch.setenv("FASTVIDEO_T5_SCAN", "1")
    assert mk(2).scan_layers is True
    monkeypatch.setenv("FASTVIDEO_T5_SCAN", "0")
    assert mk(24).scan_layers is False
