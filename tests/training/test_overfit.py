"""Nightly-style single-sample overfit convergence tests.

Reference analog: fastvideo/tests/nightly/test_e2e_*.py — each flagship
method must not just *run* but *learn*: on one fixed sample, its loss must
fall below a stored reference curve. Curves live in
tests/training/overfit_curves.json (regenerate on intentional change with
FASTVIDEO_UPDATE_CURVES=1 pytest tests/training/test_overfit.py).

The gate per checkpoint step is stored_loss * MARGIN, so numeric drift
within a factor passes but a method that stops learning fails.
"""

import json
import os

import numpy as np
import pytest

CURVES = os.path.join(os.path.dirname(__file__), "overfit_curves.json")
MARGIN = 1.3
CHECK_STEPS = (10, 25, 50)


def _gate(method: str, losses: list[float]) -> None:
    losses = [float(x) for x in losses]
    assert np.isfinite(losses).all(), losses
    if os.getenv("FASTVIDEO_UPDATE_CURVES") == "1":
        data = {}
        if os.path.exists(CURVES):
            with open(CURVES) as fh:
                data = json.load(fh)
        data[method] = {str(s): losses[s - 1] for s in CHECK_STEPS
                        if s <= len(losses)}
        with open(CURVES, "w") as fh:
            json.dump(data, fh, indent=1, sort_keys=True)
        pytest.skip(f"updated stored curve for {method}")
    with open(CURVES) as fh:
        stored = json.load(fh)[method]
    for step_s, ref_loss in stored.items():
        step = int(step_s)
        if step > len(losses):
            continue
        got = losses[step - 1]
        assert got <= ref_loss * MARGIN, (
            f"{method}: loss at step {step} = {got:.5f} exceeds stored "
            f"{ref_loss:.5f} x{MARGIN} — the method stopped learning")
    # and it must actually have learned: final < first
    assert losses[-1] < losses[0], losses


def test_overfit_sft():
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
                        seed=0, output_dir="")
    pipe = TrainingPipeline(model, sched, args)
    rng = np.random.default_rng(0)
    latents = rng.standard_normal((1, 1, 4, 2, 8, 8)).astype(np.float32)
    embeds = rng.standard_normal((1, 1, 8, 16)).astype(np.float32)
    losses = [pipe.train_one_step(latents, embeds)["loss"]
              for _ in range(50)]
    par.destroy_mesh()
    _gate("sft", losses)


def test_overfit_dmd2_critic():
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

    args = TrainingArgs(num_gpus=1, dp_size=1, learning_rate=2e-3,
                        max_grad_norm=1.0, seed=0)
    pipe = DMD2DistillationPipeline(
        make(0), make(1), make(2), args,
        DMDConfig(dmd_denoising_steps=(1000, 500),
                  dfake_gen_update_ratio=2))
    rng = np.random.default_rng(0)
    embeds = rng.standard_normal((1, 8, 16)).astype(np.float32)
    neg = rng.standard_normal((1, 8, 16)).astype(np.float32)
    losses = [
        float(pipe.train_one_step(embeds, neg, (1, 4, 2, 8, 8))
              ["critic_loss"]) for _ in range(50)
    ]
    par.destroy_mesh()
    _gate("dmd2_critic", losses)


def test_overfit_self_forcing_critic():
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

    args = TrainingArgs(num_gpus=1, dp_size=1, learning_rate=2e-3,
                        max_grad_norm=1.0, seed=0)
    pipe = SelfForcingDistillationPipeline(
        make(0), make(1), make(2), args,
        DMDConfig(dfake_gen_update_ratio=2), denoise_steps=(1000, 500))
    rng = np.random.default_rng(0)
    embeds = rng.standard_normal((1, 6, 16)).astype(np.float32)
    neg = rng.standard_normal((1, 6, 16)).astype(np.float32)
    losses = [
        float(pipe.train_one_step(embeds, neg, (1, 4, 4, 8, 8))
              ["critic_loss"]) for _ in range(25)
    ]
    par.destroy_mesh()
    _gate("self_forcing_critic", losses)
