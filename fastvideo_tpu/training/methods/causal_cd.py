"""Causal consistency distillation.

Behavioral reference: /root/reference/fastvideo/train/methods/
consistency_model/causal_cd.py (:19-237): a student is distilled against a
frozen CFG teacher on a discrete N-point self-forcing sigma grid — at a
random grid index, the teacher's guided flow takes one Euler step
``x_{t+1} = x_t - dt * v_cfg``; the consistency loss matches the student's
x0 at t against a frozen EMA model's x0 at t_next; the EMA copies the
student with decay after ``ema_start_step``.

TPU shape: the full step (teacher CFG + student fwd/bwd + EMA x0) is one
jitted XLA program; the grid index is a traced scalar gathered from the
precomputed sigma table.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.fastvideo_args import TrainingArgs
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.models.schedulers.scheduling_self_forcing_flow_match import (  # noqa: E501
    SelfForcingFlowMatchScheduler)
from fastvideo_tpu.parallel import maybe_init_mesh, mesh_context
from fastvideo_tpu.training.methods.base import (PipelineMethod,
                                                 register_method)
from fastvideo_tpu.training.run_config import (TrainRunConfig,
                                               build_training_args,
                                               build_transformer)
from fastvideo_tpu.training.training_pipeline import build_optimizer

logger = init_logger(__name__)

Array = jax.Array


class CausalCDPipeline:
    """Student/teacher/EMA consistency distillation over a sigma grid."""

    def __init__(self, student, teacher, training_args: TrainingArgs,
                 discrete_cd_n: int = 48, guidance_scale: float = 3.0,
                 ema_decay: float = 0.99, ema_start_step: int = 200,
                 flow_shift: float = 5.0, mesh=None):
        if discrete_cd_n < 2:
            raise ValueError("discrete_cd_N must be >= 2")
        self.args = training_args
        self.mesh = mesh or maybe_init_mesh(training_args.mesh_config())
        self.graphdef, self.student_params = nnx.split(student)
        _, self.teacher_params = nnx.split(teacher)
        # EMA initialised FROM the student checkpoint (reference :28-33)
        self.ema_params = jax.tree.map(jnp.copy, self.student_params)
        self.guidance_scale = float(guidance_scale)
        self.ema_decay = float(ema_decay)
        self.ema_start_step = int(ema_start_step)
        self.num_train = 1000.0

        sched = SelfForcingFlowMatchScheduler(
            num_inference_steps=int(discrete_cd_n),
            num_train_timesteps=1000, shift=float(flow_shift),
            sigma_min=0.0, sigma_max=1.0, extra_one_step=True,
            training=False)
        self.sigmas = jnp.asarray(np.asarray(sched.sigmas))
        self.timesteps = jnp.asarray(np.asarray(sched.timesteps))
        self.n = int(discrete_cd_n)

        self.tx = build_optimizer(training_args)
        self.opt_state = self.tx.init(self.student_params)
        self.rng = jax.random.PRNGKey(training_args.seed)
        self.step = 0
        self._train_step = jax.jit(self._build_step())
        decay = self.ema_decay
        self._ema_update = jax.jit(lambda ema, p: jax.tree.map(
            lambda e, q: decay * e + (1.0 - decay) * q, ema, p))

    def _flow(self, params, x, embeds, t):
        m = nnx.merge(self.graphdef, params)
        return m(x.astype(jnp.bfloat16), embeds.astype(jnp.bfloat16),
                 t).astype(jnp.float32)

    def _build_step(self):
        guidance = self.guidance_scale
        num_train = self.num_train
        sigmas = self.sigmas
        timesteps = self.timesteps
        n = self.n

        def loss_fn(student_params, teacher_params, ema_params, clean,
                    embeds, null_embeds, key):
            idx_key, noise_key = jax.random.split(key)
            idx = jax.random.randint(idx_key, (), 0, n - 1)
            t = timesteps[idx]
            t_next = timesteps[idx + 1]
            sigma_t = sigmas[idx]
            sigma_t_next = sigmas[idx + 1]
            b = clean.shape[0]
            t_arr = jnp.full((b,), 1.0, jnp.float32) * t
            t_next_arr = jnp.full((b,), 1.0, jnp.float32) * t_next

            noise = jax.random.normal(noise_key, clean.shape, jnp.float32)
            latent_t = (1.0 - sigma_t) * clean + sigma_t * noise

            # teacher CFG Euler step (reference :130-144)
            v_cond = jax.lax.stop_gradient(
                self._flow(teacher_params, latent_t, embeds, t_arr))
            v_uncond = jax.lax.stop_gradient(
                self._flow(teacher_params, latent_t, null_embeds, t_arr))
            v_pred = v_uncond + guidance * (v_cond - v_uncond)
            dt = (t - t_next) / num_train
            latent_t_next = latent_t - dt * v_pred

            flow_student = self._flow(student_params, latent_t, embeds,
                                      t_arr)
            x0_t = latent_t - sigma_t * flow_student

            flow_ema = jax.lax.stop_gradient(
                self._flow(ema_params, latent_t_next, embeds, t_next_arr))
            x0_t_next = latent_t_next - sigma_t_next * flow_ema
            return jnp.mean(jnp.square(x0_t - x0_t_next))

        import optax

        def step(student_params, opt_state, teacher_params, ema_params,
                 rng, clean, embeds, null_embeds):
            rng, key = jax.random.split(rng)
            loss, grads = jax.value_and_grad(loss_fn)(
                student_params, teacher_params, ema_params, clean, embeds,
                null_embeds, key)
            updates, opt_state = self.tx.update(grads, opt_state,
                                                student_params)
            student_params = optax.apply_updates(student_params, updates)
            return student_params, opt_state, rng, loss

        return step

    def train_one_step(self, latents: np.ndarray,
                       embeds: np.ndarray) -> dict[str, float]:
        """latents [accum, B, C, T, H, W]; embeds [accum, B, L, D] (the
        standard parquet batch; accum collapses into batch here)."""
        lat = jnp.asarray(latents, jnp.float32).reshape(
            -1, *latents.shape[2:])
        emb = jnp.asarray(embeds, jnp.float32).reshape(-1, *embeds.shape[2:])
        null = jnp.zeros_like(emb)
        with mesh_context(self.mesh):
            (self.student_params, self.opt_state, self.rng,
             loss) = self._train_step(self.student_params, self.opt_state,
                                      self.teacher_params, self.ema_params,
                                      self.rng, lat, emb, null)
            if self.step >= self.ema_start_step:
                self.ema_params = self._ema_update(self.ema_params,
                                                   self.student_params)
        self.step += 1
        return {"loss": float(loss), "causal_cd_loss": float(loss),
                "step": self.step}

    def train(self, dataloader, max_steps: int | None = None,
              callbacks=None, **kwargs) -> None:
        from fastvideo_tpu.training.callbacks import normalize_callbacks

        callbacks = normalize_callbacks(callbacks)
        self._callbacks = callbacks
        max_steps = max_steps or self.args.max_train_steps
        if callbacks is not None:
            callbacks.dispatch("on_train_start", self, self.step)
        it = iter(dataloader)
        while self.step < max_steps:
            try:
                latents, embeds = next(it)
            except StopIteration:
                it = iter(dataloader)
                latents, embeds = next(it)
            metrics = self.train_one_step(latents, embeds)
            if callbacks is not None:
                callbacks.dispatch("on_training_step_end", self, metrics,
                                   self.step)
            if self.step % 10 == 0:
                logger.info("causal_cd step %d loss %.4f", metrics["step"],
                            metrics["loss"])
        if callbacks is not None:
            callbacks.dispatch("on_train_end", self, self.step)


@register_method
class CausalCDMethod(PipelineMethod):
    """Causal consistency distillation (student/teacher/EMA roles)."""

    name = "causal_cd"

    @classmethod
    def from_config(cls, cfg: TrainRunConfig) -> "CausalCDMethod":
        targs = build_training_args(cfg)
        student = build_transformer(cfg.model)
        teacher = build_transformer(cfg.model)
        mcfg = cfg.method_config
        return cls(CausalCDPipeline(
            student, teacher, targs,
            discrete_cd_n=int(mcfg.get("discrete_cd_N", 48)),
            guidance_scale=float(mcfg.get("guidance_scale", 3.0)),
            ema_decay=float(mcfg.get("ema_decay", 0.99)),
            ema_start_step=int(mcfg.get("ema_start_step", 200)),
            flow_shift=float(mcfg.get("flow_shift", 5.0))))
