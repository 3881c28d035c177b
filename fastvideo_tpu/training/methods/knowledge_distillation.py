"""Knowledge distillation onto teacher ODE trajectories (``kd``).

Behavioral reference: /root/reference/fastvideo/train/methods/
knowledge_distillation/kd.py:634-719 — pick a random student timestep from
``t_list``, take the teacher's cached trajectory latent at that timestep,
convert the student's noise/velocity prediction to a predicted clean video,
and regress it onto the teacher's final x0 with ``0.5 * MSE``. The teacher
trajectory cache (reference ``_KDPathCache`` .pt files) becomes an ``.npz``
directory here; when no cache/teacher is configured, trajectories are rolled
out on the fly from frozen teacher params (cheap on TPU: the rollout is one
jitted program, and XLA reuses the student's compiled blocks).

TPU-native differences: one SPMD controller, functional (params, opt_state)
threading, a single jitted train step with the step-index sampled inside via
``jax.random`` (no host sync), stop_gradient teacher.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.training.methods.base import (TrainingMethod,
                                                 register_method)
from fastvideo_tpu.training.run_config import (TrainRunConfig,
                                               build_training_args,
                                               build_transformer)

logger = init_logger(__name__)


@register_method
class KDMethod(TrainingMethod):
    name = "kd"

    def __init__(self, student, training_args, teacher_params=None,
                 t_list: tuple[int, ...] = (999, 937, 833, 624),
                 num_train_timesteps: int = 1000,
                 teacher_path_cache: str | None = None, mesh=None):
        import jax
        from flax import nnx

        from fastvideo_tpu.parallel import maybe_init_mesh
        from fastvideo_tpu.training.training_pipeline import build_optimizer

        self._args = training_args
        self.t_list = tuple(int(t) for t in t_list)
        self.num_train_timesteps = num_train_timesteps
        self.teacher_path_cache = teacher_path_cache
        self.mesh = mesh or maybe_init_mesh(training_args.mesh_config())
        self.graphdef, self.params = nnx.split(student)
        self.teacher_params = teacher_params  # frozen; None => cache-only
        self.tx = build_optimizer(training_args)
        self.opt_state = self.tx.init(self.params)
        self.rng = jax.random.PRNGKey(training_args.seed)
        self.step = 0
        self._train_step = jax.jit(self._build_train_step())
        self._teacher_rollout = (jax.jit(self._build_rollout())
                                 if teacher_params is not None else None)

    @property
    def args(self) -> Any:
        return self._args

    @classmethod
    def from_config(cls, cfg: TrainRunConfig) -> "KDMethod":
        from flax import nnx

        mc = dict(cfg.method_config)
        targs = build_training_args(cfg)
        student = build_transformer(cfg.model)
        teacher_params = None
        teacher_path = mc.get("teacher_model_path")
        cache = mc.get("teacher_path_cache")
        cache_complete = bool(cache) and os.path.exists(
            os.path.join(str(cache), "COMPLETE"))
        if teacher_path:
            from dataclasses import replace
            teacher = build_transformer(
                replace(cfg.model, pretrained_model_path=teacher_path))
            _, teacher_params = nnx.split(teacher)
        elif not cache_complete:
            # default: self-distillation from the student's init weights
            # (reference: teacher may be omitted only once the cache is
            # complete, kd.py docstring)
            _, teacher_params = nnx.split(student)
            import jax
            import jax.numpy as jnp
            teacher_params = jax.tree.map(
                lambda x: jnp.copy(x) if hasattr(x, "dtype") else x,
                teacher_params)
        return cls(student, targs, teacher_params,
                   t_list=tuple(mc.get("t_list", (999, 937, 833, 624))),
                   teacher_path_cache=cache)

    # -- jitted pieces -----------------------------------------------------

    def _pred_x0(self, params, noisy, embeds, t):
        import jax.numpy as jnp
        from flax import nnx

        model = nnx.merge(self.graphdef, params)
        v = model(noisy.astype(jnp.bfloat16), embeds.astype(jnp.bfloat16),
                  t).astype(jnp.float32)
        sigma = (t / self.num_train_timesteps).reshape(
            -1, *([1] * (noisy.ndim - 1)))
        return noisy.astype(jnp.float32) - sigma * v

    def _build_rollout(self):
        """Teacher ODE over t_list; returns (trajectory [S,B,...], final x0).

        trajectory[i] is the noisy latent AT timestep t_list[i] (the input
        the student sees at that step), matching the reference cache layout.
        """
        import jax
        import jax.numpy as jnp

        t_list = self.t_list
        n = self.num_train_timesteps

        def rollout(teacher_params, noise, embeds, key):
            lat = noise
            traj = []
            keys = jax.random.split(key, len(t_list))
            for i, t_int in enumerate(t_list):
                traj.append(lat)
                t = jnp.full((noise.shape[0],), float(t_int), jnp.float32)
                x0 = self._pred_x0(teacher_params, lat, embeds, t)
                if i + 1 < len(t_list):
                    next_sigma = t_list[i + 1] / n
                    fresh = jax.random.normal(keys[i], lat.shape, lat.dtype)
                    lat = (1 - next_sigma) * x0 + next_sigma * fresh
                else:
                    lat = x0
            return (jax.lax.stop_gradient(jnp.stack(traj)),
                    jax.lax.stop_gradient(lat))

        return rollout

    def _build_train_step(self):
        import jax
        import jax.numpy as jnp

        from fastvideo_tpu.training.training_utils import clip_grad_norm

        t_arr = np.asarray(self.t_list, np.float32)
        max_norm = self._args.max_grad_norm

        def loss_fn(params, noisy, embeds, t, target_x0):
            pred_x0 = self._pred_x0(params, noisy, embeds, t)
            return 0.5 * jnp.mean(
                jnp.square(pred_x0 - target_x0.astype(jnp.float32)))

        def train_step(params, opt_state, rng, trajectory, embeds, real):
            # trajectory: [S, B, C, T, H, W]; real: [B, C, T, H, W]
            rng, k = jax.random.split(rng)
            step_i = jax.random.randint(k, (), 0, len(t_arr))
            noisy = jnp.take(trajectory, step_i, axis=0)
            t = jnp.full((noisy.shape[0],),
                         jnp.asarray(t_arr)[step_i], jnp.float32)
            loss, grads = jax.value_and_grad(loss_fn)(params, noisy, embeds,
                                                      t, real)
            grads, grad_norm = clip_grad_norm(grads, max_norm)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            import optax
            params = optax.apply_updates(params, updates)
            return params, opt_state, rng, loss, grad_norm, step_i

        return train_step

    # -- cache -------------------------------------------------------------

    def generate_cache(self, dataloader, max_samples: int) -> None:
        """Roll out the teacher over the dataloader, store .npz per sample
        (reference _KDPathCache: resumable, COMPLETE sentinel)."""
        import jax

        assert self.teacher_path_cache and self._teacher_rollout is not None
        os.makedirs(self.teacher_path_cache, exist_ok=True)
        sentinel = os.path.join(self.teacher_path_cache, "COMPLETE")
        if os.path.exists(sentinel):
            return
        i = 0
        for latents, embeds in dataloader:
            if i >= max_samples:
                break
            path = os.path.join(self.teacher_path_cache, f"{i:08d}.npz")
            if not os.path.exists(path):
                lat = np.asarray(latents, np.float32)[0]
                emb = np.asarray(embeds, np.float32)[0]
                noise = jax.random.normal(
                    jax.random.PRNGKey(i), lat.shape)
                traj, real = self._teacher_rollout(
                    self.teacher_params, noise, emb, jax.random.PRNGKey(i))
                np.savez(path, trajectory=np.asarray(traj),
                         real=np.asarray(real), text_embedding=emb,
                         t_list=np.asarray(self.t_list))
            i += 1
        with open(sentinel, "w") as f:
            f.write("ok")

    def _iter_cache(self):
        files = sorted(f for f in os.listdir(self.teacher_path_cache)
                       if f.endswith(".npz"))
        for f in files:
            d = np.load(os.path.join(self.teacher_path_cache, f))
            yield d["trajectory"], d["text_embedding"], d["real"]

    # -- loop ----------------------------------------------------------------

    def train_one_step(self, trajectory, embeds, real) -> dict[str, float]:
        from fastvideo_tpu.parallel import mesh_context

        with mesh_context(self.mesh):
            (self.params, self.opt_state, self.rng, loss, grad_norm,
             step_i) = self._train_step(self.params, self.opt_state,
                                        self.rng, trajectory, embeds, real)
        self.step += 1
        return {"kd_loss": float(loss), "grad_norm": float(grad_norm),
                "kd_step_idx": float(step_i), "step": self.step}

    def train(self, dataloader, max_steps: int | None = None,
              **kwargs) -> None:
        import jax

        max_steps = max_steps or self._args.max_train_steps
        use_cache = bool(self.teacher_path_cache)
        if use_cache and self._teacher_rollout is not None:
            self.generate_cache(dataloader, max_samples=max_steps)

        def batches():
            while True:
                if use_cache:
                    yield from self._iter_cache()
                else:
                    for latents, embeds in dataloader:
                        lat = np.asarray(latents, np.float32)[0]
                        emb = np.asarray(embeds, np.float32)[0]
                        noise = jax.random.normal(
                            jax.random.fold_in(self.rng, 2 * self.step),
                            lat.shape)
                        traj, real = self._teacher_rollout(
                            self.teacher_params, noise, emb,
                            jax.random.fold_in(self.rng, 2 * self.step + 1))
                        yield traj, emb, real

        for traj, emb, real in batches():
            if self.step >= max_steps:
                break
            metrics = self.train_one_step(traj, emb, real)
            if self.step % 10 == 0:
                logger.info("kd step %d loss %.4f (t idx %d)", self.step,
                            metrics["kd_loss"], int(metrics["kd_step_idx"]))
