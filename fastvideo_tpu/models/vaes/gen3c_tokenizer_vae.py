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
from flax import nnx

Array = jax.Array


class _TensorLatentDist:
    def __init__(self, mean: Array):
        self.mean = mean

    def mode(self) -> Array:
        return self.mean

    def sample(self, key=None) -> Array:
        return self.mean


class AutoencoderKLGen3CTokenizer(nnx.Module):
    """Wrap ``inner`` (NCDHW encode->dist / decode) with the 2x temporal
    resampling contract (reference :205-275).

    An :class:`nnx.Module` so pipeline stages can ``nnx.split`` it like
    any other VAE (the inner module's params are the only leaves; the
    resampling itself is pure jnp)."""

    def __init__(self, inner, inner_temporal_compression: int = 4,
                 target_temporal_compression: int = 8):
        self.inner = inner
        self._inner_tc = inner_temporal_compression
        self._target_tc = target_temporal_compression

    @property
    def config(self):
        return getattr(self.inner, "config", None)

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
        # All temporal resampling here operates on axis 2 == T, i.e. the
        # NCDHW layout. AutoencoderKLWan.encode returns an NDHWC
        # distribution, so prefer encode_latents (which is NCDHW) and
        # fall back to an explicit transpose.
        if hasattr(self.inner, "encode_latents"):
            z = self.inner.encode_latents(x)
        else:
            dist = self.inner.encode(x)
            z = dist.mode() if hasattr(dist, "mode") else dist
            if z.ndim == 5 and getattr(self.inner, "encode_layout",
                                       "NCDHW") == "NDHWC":
                z = jnp.transpose(z, (0, 4, 1, 2, 3))
        return _TensorLatentDist(self._inner_to_target_time(z))

    def encode_latents(self, x: Array, key: jax.Array | None = None) -> Array:
        """NCDHW latents at the target temporal contract."""
        dist = self.encode(x)
        return dist.sample(key) if key is not None else dist.mode()

    def decode(self, z: Array, **kwargs) -> Array:
        return self.inner.decode(self._target_to_inner_time(z), **kwargs)

    def decode_dispatched(self, z: Array, **kwargs) -> Array:
        """Chunked-decode passthrough (per-channel denormalize commutes
        with the temporal resample, so ordering is safe)."""
        if hasattr(self.inner, "decode_dispatched"):
            return self.inner.decode_dispatched(
                self._target_to_inner_time(z), **kwargs)
        if kwargs.pop("denormalize", False):
            z = self.denormalize_latents(z)
        kwargs.pop("decode_dtype", None)
        return self.decode(z, **kwargs)

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
