"""DMD2 distillation: generator / real-score teacher / fake-score critic.

Analog of /root/reference/fastvideo/training/distillation_pipeline.py:47-900:

* generator update: few-step self-forcing rollout (stop-grad between steps,
  backprop through the final step), then the DMD gradient
  ``(x0_fake - x0_real_cfg) / |x0_gen - x0_real|.mean()`` applied as
  ``0.5 * mse(x0_gen, stop_grad(x0_gen - grad))`` (:591-668);
* critic update: flow-matching loss on (stop-grad) generator outputs
  (:671-740);
* alternating updates with ``dfake_gen_update_ratio`` critic steps per
  generator step (:807).

Each update is one jitted XLA program; roles are separate param pytrees
over the same graphdef (all three share the DiT architecture).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from fastvideo_tpu.fastvideo_args import TrainingArgs
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.parallel import maybe_init_mesh, mesh_context
from fastvideo_tpu.training.training_pipeline import build_optimizer
from fastvideo_tpu.training.training_utils import clip_grad_norm

logger = init_logger(__name__)

Array = jax.Array


@dataclasses.dataclass
class DMDConfig:
    dmd_denoising_steps: tuple[int, ...] = (1000, 757, 522)
    real_score_guidance_scale: float = 3.5
    dfake_gen_update_ratio: int = 5
    min_timestep_ratio: float = 0.02
    max_timestep_ratio: float = 0.98
    timestep_shift: float = 8.0
    num_train_timestep: int = 1000
    simulate_generator_forward: bool = True
    # EMA of the generator (reference distillation_pipeline use_ema/ema_decay)
    ema_decay: float = 0.0  # 0 disables; e.g. 0.995
    ema_start_step: int = 0


def shift_timestep(t: Array, shift: float, num_train: float) -> Array:
    """t' = shift*t / (1 + (shift-1) * t/T) (reference training_utils)."""
    u = t.astype(jnp.float32) / num_train
    u = shift * u / (1 + (shift - 1) * u)
    return u * num_train


class DMD2DistillationPipeline:
    def __init__(self, generator, real_score, fake_score,
                 training_args: TrainingArgs,
                 dmd_config: DMDConfig | None = None, mesh=None):
        self.args = training_args
        self.dmd = dmd_config or DMDConfig()
        self.mesh = mesh or maybe_init_mesh(training_args.mesh_config())

        self.graphdef, self.gen_params = nnx.split(generator)
        _, self.real_params = nnx.split(real_score)
        _, self.fake_params = nnx.split(fake_score)

        self.gen_tx = build_optimizer(training_args)
        self.fake_tx = build_optimizer(training_args)
        self.gen_opt = self.gen_tx.init(self.gen_params)
        self.fake_opt = self.fake_tx.init(self.fake_params)
        self.rng = jax.random.PRNGKey(training_args.seed)
        self.step = 0
        self.ema_params = (jax.tree.map(jnp.copy, self.gen_params)
                           if self.dmd.ema_decay else None)

        self._gen_step = jax.jit(self._build_generator_step())
        self._critic_step = jax.jit(self._build_critic_step())
        if self.dmd.ema_decay:
            decay = float(self.dmd.ema_decay)
            self._ema_update = jax.jit(lambda ema, p: jax.tree.map(
                lambda e, q: decay * e + (1.0 - decay) * q, ema, p))

    # -- shared pieces -----------------------------------------------------

    def _model(self, params):
        return nnx.merge(self.graphdef, params)

    def _pred_x0(self, params, noisy: Array, embeds: Array,
                 t: Array) -> Array:
        """Flow model: x0 = x_t - sigma * v (pred_noise_to_pred_video)."""
        v = self._model(params)(noisy.astype(jnp.bfloat16),
                                embeds.astype(jnp.bfloat16),
                                t).astype(jnp.float32)
        sigma = (t / self.dmd.num_train_timestep).reshape(
            -1, *([1] * (noisy.ndim - 1)))
        return noisy.astype(jnp.float32) - sigma * v

    def _generator_rollout(self, gen_params, noise: Array, embeds: Array,
                           key: Array) -> Array:
        """Few-step simulation; gradient flows through the last step only
        (reference :525 _generator_multi_step_simulation_forward)."""
        steps = list(self.dmd.dmd_denoising_steps)
        num_train = self.dmd.num_train_timestep
        x = noise
        if self.dmd.simulate_generator_forward and len(steps) > 1:
            keys = jax.random.split(key, len(steps))
            for i, t_int in enumerate(steps[:-1]):
                t = jnp.full((noise.shape[0],), float(t_int), jnp.float32)
                x0 = self._pred_x0(gen_params, x, embeds, t)
                x0 = jax.lax.stop_gradient(x0)
                next_sigma = steps[i + 1] / num_train
                fresh = jax.random.normal(keys[i], x.shape, x.dtype)
                x = (1 - next_sigma) * x0 + next_sigma * fresh
        t_last = jnp.full((noise.shape[0],), float(steps[-1]), jnp.float32)
        return self._pred_x0(gen_params, x, embeds, t_last)

    def _sample_dmd_timestep(self, key: Array) -> Array:
        num_train = self.dmd.num_train_timestep
        t = jax.random.randint(key, (1,), 0, num_train).astype(jnp.float32)
        t = shift_timestep(t, self.dmd.timestep_shift, num_train)
        return jnp.clip(t, self.dmd.min_timestep_ratio * num_train,
                        self.dmd.max_timestep_ratio * num_train)

    # -- generator update --------------------------------------------------

    def _build_generator_step(self):
        dmd = self.dmd

        def loss_fn(gen_params, fake_params, real_params, noise, embeds,
                    neg_embeds, key):
            k_roll, k_t, k_noise = jax.random.split(key, 3)
            x0_gen = self._generator_rollout(gen_params, noise, embeds,
                                             k_roll)
            t = jnp.broadcast_to(self._sample_dmd_timestep(k_t),
                                 (noise.shape[0],))
            sigma = (t / dmd.num_train_timestep).reshape(
                -1, *([1] * (noise.ndim - 1)))
            n = jax.random.normal(k_noise, x0_gen.shape, jnp.float32)
            noisy = jax.lax.stop_gradient((1 - sigma) * x0_gen + sigma * n)

            x0_fake = jax.lax.stop_gradient(
                self._pred_x0(fake_params, noisy, embeds, t))
            x0_real_c = jax.lax.stop_gradient(
                self._pred_x0(real_params, noisy, embeds, t))
            x0_real_u = jax.lax.stop_gradient(
                self._pred_x0(real_params, noisy, neg_embeds, t))
            x0_real = x0_real_c + (
                x0_real_c - x0_real_u) * dmd.real_score_guidance_scale

            normalizer = jnp.mean(jnp.abs(x0_gen - x0_real))
            grad = (x0_fake - x0_real) / jnp.maximum(normalizer, 1e-6)
            grad = jnp.nan_to_num(grad)
            target = jax.lax.stop_gradient(x0_gen - grad)
            return 0.5 * jnp.mean(jnp.square(x0_gen - target))

        def step(gen_params, gen_opt, fake_params, real_params, rng, noise,
                 embeds, neg_embeds):
            rng, key = jax.random.split(rng)
            loss, grads = jax.value_and_grad(loss_fn)(
                gen_params, fake_params, real_params, noise, embeds,
                neg_embeds, key)
            grads, gnorm = clip_grad_norm(grads, self.args.max_grad_norm)
            updates, gen_opt = self.gen_tx.update(grads, gen_opt, gen_params)
            gen_params = optax.apply_updates(gen_params, updates)
            return gen_params, gen_opt, rng, loss, gnorm

        return step

    # -- critic update -----------------------------------------------------

    def _build_critic_step(self):
        dmd = self.dmd

        def loss_fn(fake_params, gen_params, noise, embeds, key):
            k_roll, k_t, k_noise = jax.random.split(key, 3)
            x0_gen = jax.lax.stop_gradient(
                self._generator_rollout(gen_params, noise, embeds, k_roll))
            num_train = dmd.num_train_timestep
            t = jax.random.randint(k_t, (1,), 0,
                                   num_train).astype(jnp.float32)
            t = jnp.broadcast_to(
                shift_timestep(t, dmd.timestep_shift, num_train),
                (noise.shape[0],))
            sigma = (t / num_train).reshape(-1, *([1] * (noise.ndim - 1)))
            n = jax.random.normal(k_noise, x0_gen.shape, jnp.float32)
            noisy = (1 - sigma) * x0_gen + sigma * n
            v_pred = self._model(fake_params)(
                noisy.astype(jnp.bfloat16), embeds.astype(jnp.bfloat16),
                t).astype(jnp.float32)
            target = n - x0_gen  # flow velocity
            return jnp.mean(jnp.square(v_pred - target))

        def step(fake_params, fake_opt, gen_params, rng, noise, embeds):
            rng, key = jax.random.split(rng)
            loss, grads = jax.value_and_grad(loss_fn)(fake_params,
                                                      gen_params, noise,
                                                      embeds, key)
            grads, gnorm = clip_grad_norm(grads, self.args.max_grad_norm)
            updates, fake_opt = self.fake_tx.update(grads, fake_opt,
                                                    fake_params)
            fake_params = optax.apply_updates(fake_params, updates)
            return fake_params, fake_opt, rng, loss, gnorm

        return step

    # -- public ------------------------------------------------------------

    def train_one_step(self, embeds: np.ndarray,
                       neg_embeds: np.ndarray,
                       latent_shape: tuple[int, ...]) -> dict[str, Any]:
        """Alternating DMD2 update (reference train_one_step:807)."""
        with mesh_context(self.mesh):
            self.rng, k = jax.random.split(self.rng)
            noise = jax.random.normal(k, latent_shape, jnp.float32)
            embeds = jnp.asarray(embeds, jnp.float32)
            neg_embeds = jnp.asarray(neg_embeds, jnp.float32)

            metrics: dict[str, Any] = {}
            if self.step % self.dmd.dfake_gen_update_ratio == 0:
                (self.gen_params, self.gen_opt, self.rng, g_loss,
                 g_norm) = self._gen_step(self.gen_params, self.gen_opt,
                                          self.fake_params,
                                          self.real_params, self.rng, noise,
                                          embeds, neg_embeds)
                metrics["generator_loss"] = float(g_loss)
                metrics["generator_grad_norm"] = float(g_norm)
                if (self.ema_params is not None
                        and self.step >= self.dmd.ema_start_step):
                    self.ema_params = self._ema_update(self.ema_params,
                                                       self.gen_params)
            (self.fake_params, self.fake_opt, self.rng, c_loss,
             c_norm) = self._critic_step(self.fake_params, self.fake_opt,
                                         self.gen_params, self.rng, noise,
                                         embeds)
            metrics["critic_loss"] = float(c_loss)
            metrics["critic_grad_norm"] = float(c_norm)
        self.step += 1
        metrics["step"] = self.step
        return metrics

    def train(self, dataloader, max_steps: int | None = None,
              log_every: int = 10, callbacks=None) -> None:
        """Drive the alternating DMD2 loop from a (latents, embeds)
        dataloader; latents only fix the noise shape (the generator
        simulates its own forward, reference distillation_pipeline.py).
        ``callbacks`` follows training_pipeline.train's contract."""
        import numpy as np

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
            # microbatch 0; zero-context as the unconditional branch
            emb = np.asarray(embeds)[0]
            metrics = self.train_one_step(emb, np.zeros_like(emb),
                                          tuple(np.asarray(latents)[0].shape))
            if callbacks is not None:
                callbacks.dispatch("on_training_step_end", self, metrics,
                                   self.step)
            if self.step % log_every == 0:
                logger.info("dmd2 step %d %s", self.step,
                            {k: round(v, 4)
                             for k, v in metrics.items()
                             if isinstance(v, float)})
        if callbacks is not None:
            callbacks.dispatch("on_train_end", self, self.step)
