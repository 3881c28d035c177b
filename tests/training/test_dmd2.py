"""DMD2 distillation: alternating updates run; losses finite; params move."""

import numpy as np


def test_dmd2_alternating_updates():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.fastvideo_args import TrainingArgs
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel
    from fastvideo_tpu.training.distillation_pipeline import (
        DMD2DistillationPipeline, DMDConfig)

    par.destroy_mesh()
    cfg = WanArchConfig(num_attention_heads=2, attention_head_dim=8,
                        in_channels=4, out_channels=4, text_dim=16,
                        freq_dim=16, ffn_dim=32, num_layers=1)

    def make(seed):
        return WanTransformer3DModel(cfg, param_dtype=jnp.float32,
                                     rngs=nnx.Rngs(seed))

    args = TrainingArgs(num_gpus=1, dp_size=1, learning_rate=1e-3,
                        max_grad_norm=1.0, seed=0)
    pipe = DMD2DistillationPipeline(
        make(0), make(1), make(2), args,
        DMDConfig(dmd_denoising_steps=(1000, 500), dfake_gen_update_ratio=2))

    rng = np.random.default_rng(0)
    embeds = rng.standard_normal((1, 8, 16)).astype(np.float32)
    neg = rng.standard_normal((1, 8, 16)).astype(np.float32)
    gen_before = np.asarray(jax.tree.leaves(pipe.gen_params)[0]).copy()
    fake_before = np.asarray(jax.tree.leaves(pipe.fake_params)[0]).copy()
    real_before = np.asarray(jax.tree.leaves(pipe.real_params)[0]).copy()

    metrics = []
    for _ in range(4):
        metrics.append(
            pipe.train_one_step(embeds, neg, (1, 4, 2, 8, 8)))
    # step 0 and 2 include generator updates
    assert "generator_loss" in metrics[0]
    assert "generator_loss" not in metrics[1]
    assert all(np.isfinite(m["critic_loss"]) for m in metrics)

    gen_after = np.asarray(jax.tree.leaves(pipe.gen_params)[0])
    fake_after = np.asarray(jax.tree.leaves(pipe.fake_params)[0])
    real_after = np.asarray(jax.tree.leaves(pipe.real_params)[0])
    assert np.abs(gen_after - gen_before).max() > 0
    assert np.abs(fake_after - fake_before).max() > 0
    np.testing.assert_array_equal(real_after, real_before)  # teacher frozen


def test_dmd2_ema_tracks_generator():
    """EMA params move toward the generator after updates."""
    import jax
    import jax.numpy as jnp
    from flax import nnx

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.fastvideo_args import TrainingArgs
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel
    from fastvideo_tpu.training.distillation_pipeline import (
        DMD2DistillationPipeline, DMDConfig)

    par.destroy_mesh()
    cfg = WanArchConfig(num_attention_heads=2, attention_head_dim=8,
                        in_channels=4, out_channels=4, text_dim=16,
                        freq_dim=16, ffn_dim=32, num_layers=1)

    def make(seed):
        return WanTransformer3DModel(cfg, param_dtype=jnp.float32,
                                     rngs=nnx.Rngs(seed))

    gen, real, fake = make(0), make(1), make(2)
    args = TrainingArgs(num_gpus=1, learning_rate=1e-3, seed=0,
                        max_train_steps=4)
    dmd = DMDConfig(dmd_denoising_steps=(1000, 500),
                    dfake_gen_update_ratio=1, ema_decay=0.5)
    pipe = DMD2DistillationPipeline(gen, real, fake, args, dmd)
    ema0 = jax.tree.leaves(pipe.ema_params)[0].copy()
    rng = np.random.default_rng(0)
    embeds = rng.standard_normal((1, 8, 16)).astype(np.float32)
    for _ in range(2):
        pipe.train_one_step(embeds, np.zeros_like(embeds), (1, 4, 2, 8, 8))
    ema1 = jax.tree.leaves(pipe.ema_params)[0]
    gen1 = jax.tree.leaves(pipe.gen_params)[0]
    # EMA moved, but not all the way to the live params
    assert np.abs(np.asarray(ema1) - np.asarray(ema0)).max() > 0
    d_live = np.abs(np.asarray(ema1) - np.asarray(gen1)).max()
    d_start = np.abs(np.asarray(ema0) - np.asarray(gen1)).max()
    assert d_live < d_start
