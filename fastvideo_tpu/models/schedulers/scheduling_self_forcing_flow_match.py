"""Self-forcing flow-match scheduler.

Behavioral reference: /root/reference/fastvideo/models/schedulers/
scheduling_self_forcing_flow_match.py (:24-160): linspace sigma schedule
shifted by ``shift*s/(1+(shift-1)s)`` (optional extra step / inversion /
reversal), nearest-timestep indexed Euler step ``x += (s' - s) * v``,
forward corruption with per-sample timesteps, Gaussian training weights,
and the high-noise alpha/beta corruption used by causal distillation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fastvideo_tpu.models.schedulers.base import BaseScheduler, SchedulerOutput

Array = jax.Array


class SelfForcingFlowMatchScheduler(BaseScheduler):
    order = 1

    def __init__(self, num_inference_steps: int = 100,
                 num_train_timesteps: int = 1000, shift: float = 3.0,
                 sigma_max: float = 1.0,
                 sigma_min: float = 0.003 / 1.002,
                 inverse_timesteps: bool = False,
                 extra_one_step: bool = False,
                 reverse_sigmas: bool = False, training: bool = False):
        self.num_train_timesteps = num_train_timesteps
        self.shift = shift
        self.sigma_max = sigma_max
        self.sigma_min = sigma_min
        self.inverse_timesteps = inverse_timesteps
        self.extra_one_step = extra_one_step
        self.reverse_sigmas = reverse_sigmas
        self.set_timesteps(num_inference_steps, training=training)

    def set_shift(self, shift: float) -> None:
        self.shift = shift

    def set_timesteps(self, num_inference_steps: int = 100,
                      denoising_strength: float = 1.0,
                      training: bool = False, **kwargs) -> None:
        sigma_start = self.sigma_min + (
            self.sigma_max - self.sigma_min) * denoising_strength
        if self.extra_one_step:
            sigmas = np.linspace(sigma_start, self.sigma_min,
                                 num_inference_steps + 1)[:-1]
        else:
            sigmas = np.linspace(sigma_start, self.sigma_min,
                                 num_inference_steps)
        if self.inverse_timesteps:
            sigmas = sigmas[::-1].copy()
        sigmas = self.shift * sigmas / (1 + (self.shift - 1) * sigmas)
        if self.reverse_sigmas:
            sigmas = 1 - sigmas
        self.sigmas = sigmas.astype(np.float32)
        self.timesteps = (sigmas * self.num_train_timesteps).astype(
            np.float32)
        if training:
            # float64: with few steps the reference's float32 exp underflows
            # to all-zeros and the normalization produces NaN weights
            # (reference scheduling_self_forcing_flow_match.py:57-62 has the
            # same expression; it is only ever exercised at 1000 steps).
            x = self.timesteps.astype(np.float64)
            y = np.exp(-2 * ((x - num_inference_steps / 2) /
                             num_inference_steps)**2)
            y_shifted = y - y.min()
            denom = y_shifted.sum()
            if denom <= 0:
                weights = np.ones_like(y_shifted)
            else:
                weights = y_shifted * (num_inference_steps / denom)
            self.linear_timesteps_weights = weights.astype(np.float32)

    def _timestep_id(self, timestep) -> jnp.ndarray:
        t = jnp.atleast_1d(jnp.asarray(timestep, jnp.float32)).reshape(-1)
        ts = jnp.asarray(self.timesteps)
        return jnp.argmin(jnp.abs(ts[None] - t[:, None]), axis=1)

    def step(self, model_output: Array, timestep, sample: Array,
             to_final: bool = False, **kwargs) -> SchedulerOutput:
        tid = self._timestep_id(timestep)
        sigmas = jnp.asarray(self.sigmas)
        expand = (-1,) + (1,) * (sample.ndim - 1)
        sigma = sigmas[tid].reshape(expand)
        terminal = 1.0 if (self.inverse_timesteps
                           or self.reverse_sigmas) else 0.0
        at_end = bool(np.any(np.asarray(tid) + 1 >= len(self.timesteps)))
        if to_final or at_end:
            sigma_next = terminal
        else:
            sigma_next = sigmas[tid + 1].reshape(expand)
        prev = sample.astype(jnp.float32) + model_output.astype(
            jnp.float32) * (sigma_next - sigma)
        return SchedulerOutput(prev_sample=prev.astype(sample.dtype))

    @staticmethod
    def calculate_alpha_beta_high(sigma, sigma_bound):
        alpha = (1 - sigma) / (1 - sigma_bound)
        beta = jnp.sqrt(sigma**2 - (alpha * sigma_bound)**2)
        return alpha, beta

    def add_noise(self, original_samples: Array, noise: Array,
                  timestep) -> Array:
        tid = self._timestep_id(timestep)
        expand = (-1,) + (1,) * (original_samples.ndim - 1)
        sigma = jnp.asarray(self.sigmas)[tid].reshape(expand)
        return ((1 - sigma) * original_samples.astype(jnp.float32) +
                sigma * noise.astype(jnp.float32)).astype(noise.dtype)

    def add_noise_high(self, original_samples: Array, noise: Array,
                       timestep, boundary_timestep) -> Array:
        expand = (-1,) + (1,) * (original_samples.ndim - 1)
        sigma = jnp.asarray(self.sigmas)[self._timestep_id(
            timestep)].reshape(expand)
        sigma_b = jnp.asarray(self.sigmas)[self._timestep_id(
            boundary_timestep)].reshape(expand)
        alpha, beta = self.calculate_alpha_beta_high(sigma, sigma_b)
        return (alpha * original_samples.astype(jnp.float32) +
                beta * noise.astype(jnp.float32)).astype(noise.dtype)

    def training_target(self, sample: Array, noise: Array,
                        timestep) -> Array:
        return noise - sample

    def training_weight(self, timestep) -> Array:
        tid = self._timestep_id(timestep)
        return jnp.asarray(self.linear_timesteps_weights)[tid]


EntryClass = SelfForcingFlowMatchScheduler
