"""Self-forcing distillation: alternating updates run on a tiny causal Wan."""

import numpy as np


def test_self_forcing_updates():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.fastvideo_args import TrainingArgs
    from fastvideo_tpu.models.dits.causal_wan import (
        CausalWanTransformer3DModel)
    from fastvideo_tpu.training.distillation_pipeline import DMDConfig
    from fastvideo_tpu.training.self_forcing_pipeline import (
        SelfForcingDistillationPipeline)

    par.destroy_mesh()
    cfg = WanArchConfig(num_attention_heads=2, attention_head_dim=8,
                        in_channels=4, out_channels=4, text_dim=16,
                        freq_dim=16, ffn_dim=32, num_layers=1,
                        num_frames_per_block=2, local_attn_size=4)

    def make(seed):
        return CausalWanTransformer3DModel(cfg, param_dtype=jnp.float32,
                                           rngs=nnx.Rngs(seed))

    args = TrainingArgs(num_gpus=1, dp_size=1, learning_rate=1e-3,
                        max_grad_norm=1.0, seed=0)
    pipe = SelfForcingDistillationPipeline(
        make(0), make(1), make(2), args,
        DMDConfig(dfake_gen_update_ratio=2), denoise_steps=(1000, 500))

    rng = np.random.default_rng(0)
    embeds = rng.standard_normal((1, 6, 16)).astype(np.float32)
    neg = rng.standard_normal((1, 6, 16)).astype(np.float32)
    gen_before = np.asarray(jax.tree.leaves(pipe.gen_params)[0]).copy()
    m0 = pipe.train_one_step(embeds, neg, (1, 4, 4, 8, 8))
    m1 = pipe.train_one_step(embeds, neg, (1, 4, 4, 8, 8))
    assert "generator_loss" in m0 and "generator_loss" not in m1
    assert np.isfinite(m0["critic_loss"]) and np.isfinite(m1["critic_loss"])
    gen_after = np.asarray(jax.tree.leaves(pipe.gen_params)[0])
    assert np.abs(gen_after - gen_before).max() > 0
