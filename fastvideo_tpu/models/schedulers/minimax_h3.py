"""MiniMax H3 rectified-flow scheduler (clean-time convention).

Numerics mirror /root/reference/fastvideo/models/schedulers/
scheduling_minimax_h3.py (:17-147): sigmas shift-warp linspace(1,0),
timesteps are CLEAN time ``1 - sigma``; the step derives x0 from the
transformer timestep (``denoised = x + (1-t)*v``) then blends with the
stored sigma grid ratio ``x' = r*x + (1-r)*x0`` with ``r = s_next/s``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fastvideo_tpu.models.schedulers.base import BaseScheduler, SchedulerOutput

Array = jax.Array


class MiniMaxH3Scheduler(BaseScheduler):

    num_train_timesteps: int = 1000

    def __init__(self, shift: float = 12.0, **kwargs):
        assert shift > 0, "`shift` must be positive"
        self._shift = float(shift)
        self.num_inference_steps: int | None = None
        self.sigmas: np.ndarray | None = None
        self.timesteps: np.ndarray | None = None
        self._step_index: int | None = None
        self._begin_index: int | None = None

    @property
    def shift(self) -> float:
        return self._shift

    def set_shift(self, shift: float) -> None:
        assert shift > 0
        self._shift = float(shift)

    def set_begin_index(self, begin_index: int = 0) -> None:
        self._begin_index = begin_index

    def set_timesteps(self, num_inference_steps: int | None = None,
                      sigmas=None, **kwargs) -> None:
        if sigmas is None:
            assert num_inference_steps and num_inference_steps >= 2
            base = np.linspace(1.0, 0.0, int(num_inference_steps),
                               dtype=np.float32)
            sig = self._shift * base / (1 + (self._shift - 1) * base)
            # unique_consecutive
            keep = np.ones(len(sig), bool)
            keep[1:] = sig[1:] != sig[:-1]
            sig = sig[keep]
        else:
            sig = np.asarray(sigmas, np.float32).reshape(-1)
            assert len(sig) >= 2 and (sig[1:] < sig[:-1]).all() and \
                sig[-1] == 0.0
        self.sigmas = sig
        self.timesteps = (1.0 - sig[:-1]).astype(np.float32)
        self.num_inference_steps = len(self.timesteps)
        self._step_index = None
        self._begin_index = None

    def index_for_timestep(self, timestep) -> int:
        idx = np.nonzero(self.timesteps == np.float32(timestep))[0]
        assert len(idx) > 0, "timestep not in self.timesteps"
        return int(idx[0])

    def scale_noise(self, sample: Array, timestep, noise: Array) -> Array:
        t = jnp.asarray(timestep, sample.dtype)
        while t.ndim < sample.ndim:
            t = t[..., None]
        return t * sample + (1.0 - t) * noise

    def step(self, model_output: Array, timestep, sample: Array,
             **kwargs) -> SchedulerOutput:
        if self._step_index is None:
            self._step_index = (self.index_for_timestep(timestep)
                                if self._begin_index is None else
                                self._begin_index)
        sigma_from_t = 1.0 - jnp.asarray(float(timestep), sample.dtype)
        denoised = sample + sigma_from_t * model_output.astype(sample.dtype)
        sigma = float(self.sigmas[self._step_index])
        sigma_next = float(self.sigmas[self._step_index + 1])
        ratio = sigma_next / sigma
        prev = ratio * sample.astype(jnp.float32) + \
            (1.0 - ratio) * denoised.astype(jnp.float32)
        self._step_index += 1
        return SchedulerOutput(prev_sample=prev.astype(sample.dtype))


EntryClass = MiniMaxH3Scheduler
