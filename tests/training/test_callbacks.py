"""Callback architecture: grad-clip / EMA / validation hooks compose into
the training loop (reference train/callbacks/)."""

import numpy as np
import pytest


def _make_pipeline(tmp_path, max_grad_norm=1.0):
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
                        max_train_steps=6, max_grad_norm=max_grad_norm,
                        weighting_scheme="uniform", seed=0,
                        output_dir=str(tmp_path), checkpointing_steps=0)
    return TrainingPipeline(model, scheduler, args)


def _loader():
    rng = np.random.default_rng(0)
    while True:
        yield (rng.standard_normal((1, 2, 4, 2, 8, 8)).astype(np.float32),
               rng.standard_normal((1, 2, 8, 16)).astype(np.float32))


def test_callback_dict_builtins_and_hooks(tmp_path):
    from fastvideo_tpu.training.callbacks import (CallbackDict,
                                                  EMACallback)

    pipe = _make_pipeline(tmp_path)
    cbs = CallbackDict({
        "grad_clip": {"max_grad_norm": 0.5},
        "ema": {"decay": 0.5},
    })
    assert len(cbs) == 2
    pipe.train(_loader(), max_steps=5, callbacks=cbs)
    assert pipe.args.max_grad_norm == 0.5  # grad_clip reconfigured

    ema = cbs["ema"]
    assert isinstance(ema, EMACallback)
    assert ema.shadow is not None
    import jax

    # shadow tracked but lags the live params
    live = jax.tree.leaves(pipe.state.params)
    shadow = jax.tree.leaves(ema.shadow)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(live, shadow)]
    assert any(d > 0 for d in diffs)

    # ema_context swaps the shadow in and back out
    before = np.asarray(live[0])
    with ema.ema_context(pipe):
        swapped = np.asarray(jax.tree.leaves(pipe.state.params)[0])
        assert not np.array_equal(before, swapped)
    after = np.asarray(jax.tree.leaves(pipe.state.params)[0])
    np.testing.assert_array_equal(before, after)

    # state dict round-trip
    sd = cbs.state_dict()
    assert "ema" in sd and sd["ema"]
    cbs.load_state_dict(sd)


def test_custom_and_validation_callbacks(tmp_path):
    from fastvideo_tpu.training.callbacks import Callback, CallbackDict

    calls = []

    class Probe(Callback):
        def on_train_start(self, method, iteration=0):
            calls.append(("start", iteration))

        def on_training_step_end(self, method, loss_dict, iteration=0):
            calls.append(("step", iteration, loss_dict["loss"]))

        def on_train_end(self, method, iteration=0):
            calls.append(("end", iteration))

    pipe = _make_pipeline(tmp_path)
    cbs = CallbackDict({"probe": {"_target_": Probe}})
    pipe.train(_loader(), max_steps=3, callbacks=cbs)
    kinds = [c[0] for c in calls]
    assert kinds[0] == "start" and kinds[-1] == "end"
    assert kinds.count("step") == 3


def test_unknown_callback_without_target_skipped():
    from fastvideo_tpu.training.callbacks import CallbackDict

    cbs = CallbackDict({"mystery": {"foo": 1}})
    assert len(cbs) == 0


def test_validation_callback_dataset_prompts(tmp_path):
    """ValidationCallback(dataset_path=...) samples the ValidationDataset's
    prompts (capped at max_samples) at each validation event."""
    import json

    from fastvideo_tpu.training.callbacks import ValidationCallback

    val = tmp_path / "val.json"
    val.write_text(json.dumps(
        {"data": [{"caption": f"cap {i}"} for i in range(5)]}))

    seen = []

    class Method:
        def validation_sample(self, prompt=None, num_inference_steps=4):
            seen.append(prompt)
            return {"loss": 0.0}

    cb = ValidationCallback(every_n_steps=2, dataset_path=str(val),
                            max_samples=3)
    cb.on_training_step_end(Method(), {}, iteration=1)
    assert seen == []  # not a validation step
    cb.on_training_step_end(Method(), {}, iteration=2)
    assert seen == ["cap 0", "cap 1", "cap 2"]
