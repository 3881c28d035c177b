"""Training utilities: timestep-density sampling, sigmas, grad clipping.

Analog of /root/reference/fastvideo/training/training_utils.py:63-141
(compute_density_for_timestep_sampling, get_sigmas, clip_grad_norm).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def compute_density_for_timestep_sampling(
    weighting_scheme: str,
    batch_size: int,
    key: jax.Array,
    logit_mean: float = 0.0,
    logit_std: float = 1.0,
    mode_scale: float = 1.29,
) -> Array:
    """SD3-style u in [0,1] (reference training_utils.py:63-93)."""
    if weighting_scheme == "logit_normal":
        u = logit_mean + logit_std * jax.random.normal(key, (batch_size,))
        return jax.nn.sigmoid(u)
    u = jax.random.uniform(key, (batch_size,))
    if weighting_scheme == "mode":
        return 1 - u - mode_scale * (jnp.cos(math.pi * u / 2)**2 - 1 + u)
    return u


def get_sigmas(scheduler, timesteps: Array, n_dim: int) -> Array:
    """Per-sample sigma from scheduler tables, broadcast to latent rank."""
    sched_ts = jnp.asarray(np.asarray(scheduler.timesteps))
    sched_sigmas = jnp.asarray(np.asarray(scheduler.sigmas))
    idx = jnp.argmin(jnp.abs(sched_ts[None, :] - timesteps[:, None]),
                     axis=1)
    sigmas = sched_sigmas[idx]
    return sigmas.reshape(sigmas.shape[0], *([1] * (n_dim - 1)))


def global_grad_norm(grads) -> Array:
    leaves = jax.tree.leaves(grads)
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))


def clip_grad_norm(grads, max_norm: float):
    """Returns (clipped grads, pre-clip global norm)."""
    norm = global_grad_norm(grads)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree.map(lambda g: g * scale.astype(g.dtype), grads), norm
