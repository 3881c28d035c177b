"""GEN3C tokenizer-VAE temporal adapter.

Behavioral reference: /root/reference/fastvideo/models/vaes/
gen3c_tokenizer_vae.py (:157-366): GEN3C diffusion expects 8x temporal
compression (121 -> 16 latents) while the bundled tokenizer follows the
standard 4x path, so the adapter drops every other latent frame after
encode and re-inserts midpoint-averaged frames before decode. The
reference's inner model is an opaque TorchScript blob (tokenizer.pth);
the TPU port wraps ANY in-repo VAE (Wan by default) behind the same
latent-time contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


class _TensorLatentDist:
    def __init__(self, mean: Array):
        self.mean = mean

    def mode(self) -> Array:
        return self.mean

    def sample(self, key=None) -> Array:
        return self.mean


class AutoencoderKLGen3CTokenizer:
    """Wrap ``inner`` (NCDHW encode->dist / decode) with the 2x temporal
    resampling contract (reference :205-275)."""

    def __init__(self, inner, inner_temporal_compression: int = 4,
                 target_temporal_compression: int = 8):
        self.inner = inner
        self.config = getattr(inner, "config", None)
        self._inner_tc = inner_temporal_compression
        self._target_tc = target_temporal_compression

    def _inner_to_target_time(self, z: Array) -> Array:
        if z.shape[2] <= 1:
            return z
        if self._target_tc == 2 * self._inner_tc:
            return z[:, :, 0::2]
        t_inner = z.shape[2]
        t_target = 1 + (t_inner - 1) * self._inner_tc // self._target_tc
        idx = jnp.round(jnp.linspace(0, t_inner - 1,
                                     t_target)).astype(jnp.int32)
        return jnp.take(z, idx, axis=2)

    def _target_to_inner_time(self, z: Array) -> Array:
        if z.shape[2] <= 1:
            return z
        if self._target_tc == 2 * self._inner_tc:
            mid = 0.5 * (z[:, :, :-1] + z[:, :, 1:])
            stacked = jnp.stack([z[:, :, :-1], mid], axis=3)
            b, c, tm1, _, h, w = stacked.shape
            out = stacked.reshape(b, c, 2 * tm1, h, w)
            return jnp.concatenate([out, z[:, :, -1:]], axis=2)
        t_target = z.shape[2]
        t_inner = 1 + (t_target - 1) * self._target_tc // self._inner_tc
        idx = jnp.linspace(0, t_target - 1, t_inner)
        idx0 = jnp.floor(idx).astype(jnp.int32)
        idx1 = jnp.clip(jnp.ceil(idx).astype(jnp.int32), None, t_target - 1)
        frac = (idx - idx0).reshape(1, 1, -1, 1, 1)
        z0 = jnp.take(z, idx0, axis=2)
        z1 = jnp.take(z, idx1, axis=2)
        return z0 * (1.0 - frac) + z1 * frac

    def encode(self, x: Array) -> _TensorLatentDist:
        dist = self.inner.encode(x)
        z = dist.mode() if hasattr(dist, "mode") else dist
        return _TensorLatentDist(self._inner_to_target_time(z))

    def decode(self, z: Array, **kwargs) -> Array:
        return self.inner.decode(self._target_to_inner_time(z), **kwargs)

    def normalize_latents(self, z: Array) -> Array:
        return (self.inner.normalize_latents(z)
                if hasattr(self.inner, "normalize_latents") else z)

    def denormalize_latents(self, z: Array) -> Array:
        return (self.inner.denormalize_latents(z)
                if hasattr(self.inner, "denormalize_latents") else z)

    def get_latent_num_frames(self, num_pixel_frames: int) -> int:
        if num_pixel_frames <= 1:
            return 1
        return 1 + (num_pixel_frames - 1) // self._target_tc

    def get_pixel_num_frames(self, num_latent_frames: int) -> int:
        if num_latent_frames <= 1:
            return 1
        return (num_latent_frames - 1) * self._target_tc + 1


EntryClass = AutoencoderKLGen3CTokenizer
