"""AnyFlow on-policy distillation (stage-2 DMD over a flow-map rollout).

Behavioral reference: /root/reference/fastvideo/train/methods/
distribution_matching/anyflow.py (:36-209): the student is rolled out for
``student_sample_steps`` Euler-flow steps from pure noise (mean-velocity
sampling, r = t_next); exactly ONE randomly-chosen rollout step is
gradient-enabled per update; the DMD VSD-with-fake-score loss and the
alternating student/critic machinery are inherited from DMD2.

TPU shape: the whole rollout lives inside the jitted generator step; the
gradient-enabled step index enters as a traced scalar, with
``stop_gradient`` gating via ``jnp.where`` on the step index — no
cross-rank broadcast needed (single-controller SPMD sees one RNG).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fastvideo_tpu.training.distillation_pipeline import (
    DMD2DistillationPipeline)
from fastvideo_tpu.training.methods.base import (PipelineMethod,
                                                 register_method)
from fastvideo_tpu.training.methods.distribution_matching import (
    _dmd_config)
from fastvideo_tpu.training.run_config import (TrainRunConfig,
                                               build_training_args,
                                               build_transformer)

Array = jax.Array


class AnyFlowDistillationPipeline(DMD2DistillationPipeline):
    """DMD2 with a multi-step on-policy Euler-flow rollout."""

    def __init__(self, *args, student_sample_steps: int = 4,
                 t_list_override: list[float] | None = None, **kwargs):
        generator = args[0] if args else kwargs.get("generator")
        self._has_r = bool(generator is not None and getattr(
            generator.config, "r_embedder", False))
        self.student_sample_steps = int(student_sample_steps)
        if self.student_sample_steps <= 0:
            raise ValueError("student_sample_steps must be positive")
        if t_list_override is not None:
            t_list = [float(x) for x in t_list_override]
            if any(a < b for a, b in zip(t_list, t_list[1:])):
                raise ValueError("t_list_override must be descending")
            self.t_list_override = t_list
        else:
            self.t_list_override = None
        super().__init__(*args, **kwargs)

    def _rollout_schedule(self) -> list[float]:
        """Descending t schedule, num_steps + 1 boundaries
        (reference :96-112)."""
        if self.t_list_override is not None:
            return list(self.t_list_override)
        steps = [float(t) for t in self.dmd.dmd_denoising_steps]
        if steps[-1] != 0.0:
            steps = steps + [0.0]
        return steps

    def _generator_rollout(self, gen_params, noise: Array, embeds: Array,
                           key: Array) -> Array:
        """Multi-step Euler-flow rollout with ONE grad-enabled step
        (reference training_rollout w/ use_mean_velocity=True)."""
        t_list = self._rollout_schedule()
        num_steps = len(t_list) - 1
        num_train = self.dmd.num_train_timestep
        grad_key, _ = jax.random.split(key)
        grad_step = jax.random.randint(grad_key, (), 0, num_steps)

        x = noise.astype(jnp.float32)
        # dual-timestep flow-map trunk: the mean-velocity field is
        # u(x_t, t, r=t_next) (reference training_rollout with
        # use_mean_velocity=True) — r must reach the r_embedder
        has_r = self._has_r
        for i in range(num_steps):
            t = float(t_list[i])
            t_next = float(t_list[i + 1])
            t_arr = jnp.full((noise.shape[0],), t, jnp.float32)
            kw = {}
            if has_r:
                kw["r_timestep"] = jnp.full((noise.shape[0],), t_next,
                                            jnp.float32)
            v = self._model(gen_params)(
                x.astype(jnp.bfloat16), embeds.astype(jnp.bfloat16),
                t_arr, **kw).astype(jnp.float32)
            # gradient flows only through the chosen step: elsewhere the
            # velocity is treated as a constant
            v = jnp.where(grad_step == i, v, jax.lax.stop_gradient(v))
            dt = (t - t_next) / num_train
            x = x - dt * v
        return x


@register_method
class AnyFlowMethod(PipelineMethod):
    """AnyFlow on-policy distillation (multi-step flow-map rollout)."""

    name = "anyflow"

    @classmethod
    def from_config(cls, cfg: TrainRunConfig) -> "AnyFlowMethod":
        targs = build_training_args(cfg)
        mcfg = cfg.method_config
        # the AnyFlow student is the dual-timestep flow-map trunk
        # u(x_t, t, r): grow the r_embedder on ALL roles (one shared
        # graphdef; the scores simply never receive r_timestep) unless
        # the config opts out of mean-velocity sampling
        overrides = None
        if bool(mcfg.get("use_mean_velocity", True)):
            overrides = {
                "r_embedder": True,
                "r_embedder_fusion": mcfg.get("r_embedder_fusion",
                                              "additive"),
                "r_embedder_gate_value": float(
                    mcfg.get("r_embedder_gate_value", 0.25)),
                "r_embedder_deltatime_type": mcfg.get(
                    "r_embedder_deltatime_type", "r"),
            }
        generator = build_transformer(cfg.model, arch_overrides=overrides)
        real_score = build_transformer(cfg.model, arch_overrides=overrides)
        fake_score = build_transformer(cfg.model, arch_overrides=overrides)
        if overrides is not None:
            # checkpoints without delta weights: init delta_embedder as a
            # copy of time_embedder (reference wanvideo.py:102-104)
            import os

            from fastvideo_tpu.models.loader.safetensors_io import (
                find_safetensors_files)
            from fastvideo_tpu.training.methods.anyflow_pretrain import (
                _safetensors_keys)

            tdir = os.path.join(cfg.model.pretrained_model_path,
                                "transformer")
            has_delta = any(
                "delta_embedder" in k
                for p in find_safetensors_files(tdir)
                for k in _safetensors_keys(p))
            if not has_delta:
                from flax import nnx as _nnx

                for m in (generator, real_score, fake_score):
                    ce = m.condition_embedder
                    src = _nnx.state(ce.time_embedder)
                    _nnx.update(ce.delta_embedder,
                                jax.tree.map(jnp.copy, src))
        return cls(AnyFlowDistillationPipeline(
            generator, real_score, fake_score, targs, _dmd_config(cfg),
            student_sample_steps=int(mcfg.get("student_sample_steps", 4)),
            t_list_override=mcfg.get("t_list_override")))
