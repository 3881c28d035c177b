"""DPM-Solver++(3M) SDE sampler + v-prediction wrapper, JAX-native.

Behavioral reference: the k-diffusion sampler used by Stable Audio
(/root/reference/fastvideo/pipelines/basic/stable_audio/stages/denoising.py
:92-145 -> k_diffusion.sampling.sample_dpmpp_3m_sde + external.VDenoiser;
math per Lu et al., DPM-Solver++ and the k-diffusion SDE variant).

The model function is wrapped per k-diffusion's VDenoiser (v-prediction,
sigma_data=1): the sampler works in denoised-x0 space.
"""

from __future__ import annotations

import math
from collections.abc import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


def get_sigmas_polyexponential(n: int, sigma_min: float, sigma_max: float,
                               rho: float = 1.0) -> jnp.ndarray:
    """Polyexponential sigma schedule (k-diffusion): log-space ramp^rho,
    plus trailing 0."""
    ramp = jnp.linspace(1.0, 0.0, n) ** rho
    sigmas = jnp.exp(ramp * (math.log(sigma_max) - math.log(sigma_min))
                     + math.log(sigma_min))
    return jnp.concatenate([sigmas, jnp.zeros((1,))])


def v_denoiser(model: Callable[[Array, Array], Array],
               sigma_data: float = 1.0) -> Callable[[Array, Array], Array]:
    """Wrap a v-prediction model as a denoiser x, sigma -> x0
    (k_diffusion.external.VDenoiser)."""

    def denoise(x: Array, sigma: Array) -> Array:
        sigma = jnp.asarray(sigma, jnp.float32)
        c_skip = sigma_data ** 2 / (sigma ** 2 + sigma_data ** 2)
        c_out = -sigma * sigma_data / jnp.sqrt(sigma ** 2 + sigma_data ** 2)
        c_in = 1.0 / jnp.sqrt(sigma ** 2 + sigma_data ** 2)
        t = jnp.arctan(sigma / sigma_data) / math.pi * 2.0
        t_b = jnp.broadcast_to(t, (x.shape[0],))
        v = model((x.astype(jnp.float32) * c_in), t_b)
        return v.astype(jnp.float32) * c_out + x.astype(jnp.float32) * c_skip

    return denoise


def sample_dpmpp_3m_sde(denoise: Callable[[Array, Array], Array], x: Array,
                        sigmas: Array, *, eta: float = 1.0,
                        s_noise: float = 1.0,
                        key: jax.Array | None = None,
                        callback: Callable[[int, Array], Array] | None = None
                        ) -> Array:
    """DPM-Solver++(3M) SDE over a denoiser (x, sigma) -> x0.

    ``callback(i, x) -> x`` runs after each step (RePaint blending hook).
    The python loop is intentional: each `denoise` call is one jitted
    device program; step count is O(100).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    sig = [float(s) for s in sigmas]
    n = len(sig) - 1
    denoised_1 = denoised_2 = None
    h_1 = h_2 = None
    x = x.astype(jnp.float32)
    for i in range(n):
        denoised = denoise(x, sig[i])
        if sig[i + 1] == 0.0:
            x = denoised
        else:
            t, s = -math.log(sig[i]), -math.log(sig[i + 1])
            h = s - t
            h_eta = h * (eta + 1.0)
            x = math.exp(-h_eta) * x + (-math.expm1(-h_eta)) * denoised
            if h_2 is not None:
                r0 = h_1 / h
                r1 = h_2 / h
                d1_0 = (denoised - denoised_1) / r0
                d1_1 = (denoised_1 - denoised_2) / r1
                d1 = d1_0 + (d1_0 - d1_1) * r0 / (r0 + r1)
                d2 = (d1_0 - d1_1) / (r0 + r1)
                phi_2 = math.expm1(-h_eta) / h_eta + 1.0
                phi_3 = phi_2 / h_eta - 0.5
                x = x + phi_2 * d1 - phi_3 * d2
            elif h_1 is not None:
                r = h_1 / h
                d = (denoised - denoised_1) / r
                phi_2 = math.expm1(-h_eta) / h_eta + 1.0
                x = x + phi_2 * d
            if eta > 0.0:
                key, sub = jax.random.split(key)
                noise = jax.random.normal(sub, x.shape, jnp.float32)
                x = x + noise * sig[i + 1] * math.sqrt(
                    -math.expm1(-2.0 * h * eta)) * s_noise
            h_2 = h_1
            h_1 = h
        denoised_2 = denoised_1
        denoised_1 = denoised
        if callback is not None:
            x = callback(i, x)
    return x
