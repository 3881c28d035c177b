"""LoRA training: adapters learn, the base model stays bit-identical.

Reference analog: /root/reference/fastvideo/pipelines/lora_pipeline.py
152-206 (training grads flow only to lora_A/lora_B).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pipeline():
    import jax.numpy as jnp
    from flax import nnx

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.fastvideo_args import TrainingArgs
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel
    from fastvideo_tpu.models.schedulers.flow_match_euler import (
        FlowMatchEulerDiscreteScheduler)
    from fastvideo_tpu.training.methods.lora import LoRATrainingPipeline

    par.destroy_mesh()
    cfg = WanArchConfig(num_attention_heads=2, attention_head_dim=8,
                        in_channels=4, out_channels=4, text_dim=16,
                        freq_dim=16, ffn_dim=32, num_layers=2)
    model = WanTransformer3DModel(cfg, param_dtype=jnp.float32,
                                  rngs=nnx.Rngs(0))
    scheduler = FlowMatchEulerDiscreteScheduler(shift=3.0)
    scheduler.set_timesteps(1000)
    args = TrainingArgs(num_gpus=1, dp_size=1, learning_rate=5e-3,
                        max_train_steps=30, max_grad_norm=1.0,
                        weighting_scheme="uniform", seed=0, output_dir="")
    return LoRATrainingPipeline(model, scheduler, args, rank=4, alpha=4.0)


def test_lora_only_params_train_and_loss_falls(pipeline):
    import jax

    # snapshot the frozen base (every non-adapter tensor)
    base_before = [np.asarray(x) for x in jax.tree.leaves(pipeline._frozen)]
    adapters_before = [np.asarray(x)
                       for x in jax.tree.leaves(pipeline.state.params)]
    # params really are adapter-only (the toy model is 16-dim so the
    # adapter fraction is large; at real widths it is <1%)
    n_trainable = sum(x.size for x in jax.tree.leaves(pipeline.state.params))
    n_frozen = sum(x.size for x in jax.tree.leaves(pipeline._frozen))
    assert n_trainable < n_frozen

    rng = np.random.default_rng(0)
    latents = rng.standard_normal((1, 1, 4, 2, 8, 8)).astype(np.float32)
    embeds = rng.standard_normal((1, 1, 8, 16)).astype(np.float32)
    losses = [pipeline.train_one_step(latents, embeds)["loss"]
              for _ in range(25)]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses

    # base params bit-identical after training
    base_after = [np.asarray(x) for x in jax.tree.leaves(pipeline._frozen)]
    for b, a in zip(base_before, base_after):
        np.testing.assert_array_equal(b, a)
    # adapters actually moved
    moved = any(
        not np.array_equal(b, np.asarray(a)) for b, a in zip(
            adapters_before, jax.tree.leaves(pipeline.state.params)))
    assert moved


def test_lora_method_registered():
    from fastvideo_tpu.training.methods import list_methods

    assert "lora_finetune" in list_methods()
