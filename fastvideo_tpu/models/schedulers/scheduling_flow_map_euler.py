"""Flow-map any-step Euler scheduler (AnyFlow).

Behavioral reference: /root/reference/fastvideo/models/schedulers/
scheduling_flow_map_euler_discrete.py (:29-203): the model predicts the
AVERAGE velocity u(x_t, t, r) from t back to r, so a single Euler step
``x_r = x_t - ((t - r)/T) * u`` is valid for any step size. Includes the
AnyFlow training helpers (shift transform, beta08/gaussian loss weights).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fastvideo_tpu.models.schedulers.base import BaseScheduler, SchedulerOutput

Array = jax.Array


class FlowMapEulerDiscreteScheduler(BaseScheduler):
    order = 1

    def __init__(self, *, num_train_timesteps: int = 1000,
                 shift: float = 1.0):
        self.num_train_timesteps = int(num_train_timesteps)
        self.shift = float(shift)
        self.timesteps = np.empty(0, np.float32)
        self.sigmas = np.empty(0, np.float32)

    def set_shift(self, shift: float) -> None:
        self.shift = float(shift)

    def apply_shift(self, t, *, shift: float | None = None):
        s = self.shift if shift is None else float(shift)
        if s == 1.0:
            return t
        return s * t / (1.0 + (s - 1.0) * t)

    def get_train_weight(self, t: Array, *,
                         weight_type: str = "beta08") -> Array:
        t_f = jnp.asarray(t, jnp.float32)
        t_norm = jnp.where(jnp.max(t_f) > 1.0 + 1e-6,
                           t_f / self.num_train_timesteps, t_f)
        t_norm = jnp.clip(t_norm, 0.0, 1.0)
        if weight_type == "uniform":
            w = jnp.ones_like(t_norm)
        elif weight_type == "gaussian":
            w = jnp.exp(-0.5 * ((t_norm - 0.5) / 0.2)**2)
        elif weight_type == "beta08":
            w = t_norm * jnp.sqrt(jnp.clip(1.0 - t_norm, 0.0))
        else:
            raise ValueError(f"Unknown weight_type: {weight_type!r}")
        return w * (float(self.num_train_timesteps) /
                    jnp.clip(jnp.sum(w), 1e-8))

    def set_timesteps(self, num_inference_steps: int | None = None,
                      custom_timesteps=None, **kwargs) -> None:
        if custom_timesteps is not None:
            ts = np.asarray(custom_timesteps, np.float32)
            if not np.all(ts[:-1] >= ts[1:]):
                raise ValueError("custom_timesteps must be descending")
        else:
            if not num_inference_steps or num_inference_steps <= 0:
                raise ValueError("num_inference_steps must be positive")
            ts_norm = np.linspace(1.0, 0.0, num_inference_steps + 1,
                                  dtype=np.float32)
            ts = np.asarray(self.apply_shift(ts_norm),
                            np.float32) * self.num_train_timesteps
        self.timesteps = ts
        self.sigmas = ts / self.num_train_timesteps

    def step(self, model_output: Array, timestep, sample: Array,
             r_timestep=None, **kwargs) -> SchedulerOutput:
        if r_timestep is None:
            raise ValueError("flow-map step requires r_timestep")
        t = jnp.asarray(timestep, jnp.float32).reshape(-1)
        r = jnp.asarray(r_timestep, jnp.float32).reshape(-1)
        dt = ((t - r) / float(self.num_train_timesteps)).reshape(
            (-1,) + (1,) * (sample.ndim - 1))
        prev = sample.astype(jnp.float32) - dt * model_output.astype(
            jnp.float32)
        return SchedulerOutput(prev_sample=prev.astype(sample.dtype))

    def add_noise(self, original_samples: Array, noise: Array,
                  timestep) -> Array:
        sigma = (jnp.asarray(timestep, jnp.float32) /
                 float(self.num_train_timesteps)).reshape(
                     (-1,) + (1,) * (original_samples.ndim - 1))
        return (1.0 - sigma) * original_samples + sigma * noise


EntryClass = FlowMapEulerDiscreteScheduler
