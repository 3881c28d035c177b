"""Latent preparation: seeded initial noise.

Analog of /root/reference/fastvideo/pipelines/stages/latent_preparation.py.
Noise is drawn with **torch CPU generators** (one per seed, diffusers
``randn_tensor`` semantics) so initial latents are bitwise-identical to the
reference at a fixed seed — the foundation of the PSNR-parity requirement.
Torch is used host-side only; the tensor immediately becomes a jax array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.stages.base import PipelineStage


def randn_like_reference(shape: tuple[int, ...],
                         seeds: list[int]) -> np.ndarray:
    """diffusers.randn_tensor with a list of CPU generators."""
    try:
        import torch

        outs = []
        for seed in seeds:
            g = torch.Generator("cpu").manual_seed(int(seed))
            outs.append(
                torch.randn((1, *shape[1:]), generator=g,
                            dtype=torch.float32).numpy())
        return np.concatenate(outs, axis=0)
    except ImportError:  # pragma: no cover
        rng = np.random.default_rng(seeds[0])
        return rng.standard_normal(shape).astype(np.float32)


class LatentPreparationStage(PipelineStage):
    def __init__(self, scheduler=None, transformer=None, vae_config=None):
        self.scheduler = scheduler
        self.transformer = transformer
        self.vae_config = vae_config

    def latent_shape(self, batch: ForwardBatch) -> tuple[int, ...]:
        sf_t = 4
        sf_s = 8
        z_dim = 16
        if self.vae_config is not None:
            arch = self.vae_config.arch_config
            sf_t = arch.scale_factor_temporal
            sf_s = arch.scale_factor_spatial
            z_dim = arch.z_dim
            if arch.patch_size:
                sf_s *= arch.patch_size
        num_latent_frames = (batch.num_frames - 1) // sf_t + 1
        batch_size = len(batch.seeds or [0]) * (
            len(batch.prompt) if isinstance(batch.prompt, list) else 1)
        return (batch_size, z_dim, num_latent_frames, batch.height // sf_s,
                batch.width // sf_s)

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if batch.latents is not None:
            return batch
        shape = self.latent_shape(batch)
        seeds = batch.seeds or [batch.seed or 0]
        from fastvideo_tpu import envs

        if envs.FASTVIDEO_DEVICE_RNG:
            batch.latents = _device_randn(shape, tuple(int(s) for s in seeds))
        else:
            noise = randn_like_reference(shape, seeds)
            batch.latents = jnp.asarray(noise)
        batch.raw_latent_shape = shape
        return batch


@functools.partial(jax.jit, static_argnames=("shape", "seeds"))
def _device_randn(shape: tuple[int, ...], seeds: tuple[int, ...]) -> jax.Array:
    """Initial noise drawn ON DEVICE (FASTVIDEO_DEVICE_RNG=1): same
    one-generator-per-seed batching as the torch path, but via threefry —
    no 8 MB host->device latent transfer per generation. Seed-deterministic,
    not torch-bitwise."""
    outs = [
        jax.random.normal(jax.random.PRNGKey(seed), (1, *shape[1:]),
                          jnp.float32) for seed in seeds
    ]
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
