"""Scheduler base types (diffusers-API compatible).

Analog of /root/reference/fastvideo/models/schedulers/ — schedulers are
self-contained, no diffusers dependency. Coefficient math runs on the host
(numpy fp32/fp64, matching the reference's CPU-resident sigmas); the latent
update is jnp elementwise and fuses into the surrounding device program.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax


@dataclasses.dataclass
class SchedulerOutput:
    prev_sample: jax.Array


class BaseScheduler:
    """Minimal diffusers-like surface: set_timesteps / step / add_noise."""

    order = 1

    def set_timesteps(self, num_inference_steps: int, **kwargs) -> None:
        raise NotImplementedError

    def step(self, model_output: jax.Array, timestep: Any,
             sample: jax.Array, **kwargs) -> SchedulerOutput:
        raise NotImplementedError

    def scale_model_input(self, sample: jax.Array, *args,
                          **kwargs) -> jax.Array:
        return sample
