"""SFT training pipeline: loss decreases on an overfit batch; checkpoint
save/resume roundtrip. CPU 8-device mesh (dp=2).

Mirrors the reference tiny-fixture training tests
(/root/reference/fastvideo/tests/train/methods/).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    import jax.numpy as jnp
    from flax import nnx

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.fastvideo_args import TrainingArgs
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel
    from fastvideo_tpu.models.schedulers.flow_match_euler import (
        FlowMatchEulerDiscreteScheduler)
    from fastvideo_tpu.training.training_pipeline import TrainingPipeline

    par.destroy_mesh()
    cfg = WanArchConfig(num_attention_heads=2, attention_head_dim=8,
                        in_channels=4, out_channels=4, text_dim=16,
                        freq_dim=16, ffn_dim=32, num_layers=2)
    model = WanTransformer3DModel(cfg, param_dtype=jnp.float32,
                                  rngs=nnx.Rngs(0))
    scheduler = FlowMatchEulerDiscreteScheduler(shift=3.0)
    scheduler.set_timesteps(1000)
    args = TrainingArgs(num_gpus=2, dp_size=2, learning_rate=3e-3,
                        max_train_steps=30, max_grad_norm=1.0,
                        weighting_scheme="uniform", seed=0,
                        output_dir=str(tmp_path_factory.mktemp("ckpt")),
                        checkpointing_steps=0)
    return TrainingPipeline(model, scheduler, args)


def test_loss_decreases(pipeline):
    rng = np.random.default_rng(0)
    latents = rng.standard_normal((1, 2, 4, 2, 8, 8)).astype(np.float32)
    embeds = rng.standard_normal((1, 2, 8, 16)).astype(np.float32)
    losses = [pipeline.train_one_step(latents, embeds)["loss"]
              for _ in range(25)]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_checkpoint_roundtrip(pipeline):
    import jax

    pipeline.save_checkpoint()
    step = pipeline.state.step
    params_before = jax.tree.leaves(pipeline.state.params)[0].copy()
    rng = np.random.default_rng(1)
    latents = rng.standard_normal((1, 2, 4, 2, 8, 8)).astype(np.float32)
    embeds = rng.standard_normal((1, 2, 8, 16)).astype(np.float32)
    pipeline.train_one_step(latents, embeds)
    pipeline.resume_from_checkpoint()
    assert pipeline.state.step == step
    params_after = jax.tree.leaves(pipeline.state.params)[0]
    np.testing.assert_array_equal(np.asarray(params_before),
                                  np.asarray(params_after))


def test_validation_callback_and_sampling(pipeline, tmp_path):
    import numpy as np

    calls = []

    def validate(pipe, step):
        # batch must be divisible by dp (the dp=2 mesh shards batch)
        lat = pipe.validation_sample(
            np.zeros((2, 8, 16), np.float32), (2, 4, 2, 8, 8),
            dmd_denoising_steps=(1000, 500), seed=3)
        calls.append(step)
        return {"latent_norm": float(np.abs(np.asarray(lat)).mean())}

    pipeline.args.validation_steps = 2
    rng = np.random.default_rng(2)
    latents = rng.standard_normal((1, 2, 4, 2, 8, 8)).astype(np.float32)
    embeds = rng.standard_normal((1, 2, 8, 16)).astype(np.float32)

    class Loader:
        def __iter__(self):
            return iter([(latents, embeds)] * 10)

    start = pipeline.state.step
    pipeline.train(Loader(), max_steps=start + 4, log_every=100,
                   validation_callback=validate)
    assert calls, "validation callback never ran"
    assert all(c % 2 == 0 for c in calls)
