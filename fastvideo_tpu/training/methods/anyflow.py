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
        for i in range(num_steps):
            t = float(t_list[i])
            t_next = float(t_list[i + 1])
            t_arr = jnp.full((noise.shape[0],), t, jnp.float32)
            v = self._model(gen_params)(
                x.astype(jnp.bfloat16), embeds.astype(jnp.bfloat16),
                t_arr).astype(jnp.float32)
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
        generator = build_transformer(cfg.model)
        real_score = build_transformer(cfg.model)
        fake_score = build_transformer(cfg.model)
        mcfg = cfg.method_config
        return cls(AnyFlowDistillationPipeline(
            generator, real_score, fake_score, targs, _dmd_config(cfg),
            student_sample_steps=int(mcfg.get("student_sample_steps", 4)),
            t_list_override=mcfg.get("t_list_override")))
