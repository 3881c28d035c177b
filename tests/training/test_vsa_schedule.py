"""VSA sparsity ramp in training (reference training_pipeline.py:557-563).

Sparsity grows by VSA_decay_rate every VSA_decay_interval_steps up to
VSA_sparsity; each level is a separately-compiled train step (the top-k
tile count is static under jit) and the VSA metadata actually reaches the
attention layer (sparse step loss differs from the dense step on the same
state)."""

import os

import numpy as np
import pytest


def _make_pipe(**extra_args):
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
    sched = FlowMatchEulerDiscreteScheduler(shift=3.0)
    sched.set_timesteps(1000)
    args = TrainingArgs(num_gpus=1, dp_size=1, learning_rate=5e-3,
                        max_grad_norm=1.0, weighting_scheme="uniform",
                        seed=0, output_dir="", **extra_args)
    return TrainingPipeline(model, sched, args)


def test_sparsity_ramp_schedule():
    pipe = _make_pipe(VSA_sparsity=0.5, VSA_decay_rate=0.25,
                      VSA_decay_interval_steps=2)
    got = [pipe.current_vsa_sparsity(s) for s in range(1, 8)]
    assert got == [0.0, 0.25, 0.25, 0.5, 0.5, 0.5, 0.5], got
    # no ramp config -> jump straight to target
    pipe2 = _make_pipe(VSA_sparsity=0.5)
    assert pipe2.current_vsa_sparsity(1) == 0.5
    # no VSA -> None (dense path, no metadata)
    pipe3 = _make_pipe()
    assert pipe3.current_vsa_sparsity(100) is None
    import fastvideo_tpu.parallel as par

    par.destroy_mesh()


def test_vsa_train_steps_compile_per_level():
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "VIDEO_SPARSE_ATTN"
    try:
        pipe = _make_pipe(VSA_sparsity=0.5, VSA_decay_rate=0.25,
                          VSA_decay_interval_steps=2)
        rng = np.random.default_rng(0)
        # grid (2, 8, 8) -> patchify (1,2,2) -> tokens (2, 4, 4)
        latents = rng.standard_normal((1, 1, 4, 2, 8, 8)).astype(np.float32)
        embeds = rng.standard_normal((1, 1, 8, 16)).astype(np.float32)
        metrics = []
        for _ in range(4):
            s = pipe.current_vsa_sparsity(pipe.state.step + 1)
            metrics.append(pipe.train_one_step(latents, embeds,
                                               vsa_sparsity=s))
        assert [m["vsa_sparsity"] for m in metrics] == \
            [0.0, 0.25, 0.25, 0.5]
        assert sorted(pipe._train_steps_by_sparsity) == [0.0, 0.25, 0.5]
        assert all(np.isfinite(m["loss"]) for m in metrics)
        import fastvideo_tpu.parallel as par

        par.destroy_mesh()
    finally:
        os.environ.pop("FASTVIDEO_ATTENTION_BACKEND", None)
