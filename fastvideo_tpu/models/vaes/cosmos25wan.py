"""Cosmos 2.5 Wan-VAE adapter (normalized-latent contract).

Behavioral reference: /root/reference/fastvideo/models/vaes/
cosmos25wanvae.py (:36-140): Cosmos2.5's diffusion model operates in a
NORMALIZED latent space — ``encode`` returns (z - mean)/std and
``decode`` expects normalized latents — while the Wan VAE itself works
in its native space. This adapter wraps our AutoencoderKLWan with that
contract. (The reference additionally carries an official-port decoder
with a time-conv interleave upsample; our Wan decoder's numerics already
match the checkpoint path used by the Cosmos2.5 pipeline.)

Not in the VAE registry on purpose: standard Cosmos2.5 checkpoints name
``AutoencoderKLWan``, whose checkpoint config carries the cosmos latent
stats, so the pipeline normalizes through the Wan class directly. Use
this adapter when driving the VAE programmatically against code that
expects the normalized-latent contract.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass
class _TensorLatentDist:
    mean: Array

    def mode(self) -> Array:
        return self.mean

    def sample(self, generator=None) -> Array:
        return self.mean


class Cosmos25WanVAEAdapter:
    """Thin wrapper; ``inner`` is an AutoencoderKLWan."""

    handles_latent_norm = True
    handles_latent_denorm = True

    def __init__(self, inner):
        self.inner = inner
        self.config = getattr(inner, "config", None)

    def _stats(self):
        mean = jnp.asarray(self.config.latents_mean_arr())[None, :, None,
                                                           None, None]
        std = jnp.asarray(self.config.latents_std_arr())[None, :, None,
                                                         None, None]
        return mean, std

    def get_latent_num_frames(self, num_pixel_frames: int) -> int:
        return 1 + (num_pixel_frames - 1) // 4

    def encode(self, x: Array) -> _TensorLatentDist:
        dist = self.inner.encode(x)
        z_mean = dist.mean
        if z_mean.ndim == 5:
            # AutoencoderKLWan.encode always returns NDHWC; transpose to
            # NCDHW unconditionally for channel-stat normalization. (A
            # shape heuristic here silently broke whenever latent T
            # happened to equal z_dim.)
            z_mean = jnp.transpose(z_mean, (0, 4, 1, 2, 3))
        mean, std = self._stats()
        return _TensorLatentDist((z_mean - mean) / std)

    def decode(self, z: Array) -> Array:
        mean, std = self._stats()
        return self.inner.decode(z * std + mean)

    def __getattr__(self, name):
        return getattr(self.inner, name)
