"""VAE decoding stage.

Analog of /root/reference/fastvideo/pipelines/stages/decoding.py:
denormalize latents by the VAE's per-channel mean/std, decode (bf16 decode
precision per reference configs/pipelines/wan.py vae_decode_precision), and
emit pixel frames in [-1, 1].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.stages.base import PipelineStage


class DecodingStage(PipelineStage):
    def __init__(self, vae, pipeline_config=None):
        self.vae = vae
        self.pipeline_config = pipeline_config
        self._decode_fn = None

    def _decode_dtype(self):
        precision = (self.pipeline_config.vae_decode_precision
                     if self.pipeline_config is not None else "bf16")
        return jnp.float32 if precision == "fp32" else jnp.bfloat16

    def _get_decode_fn(self):
        if self._decode_fn is None:
            graphdef, state = nnx.split(self.vae)
            dtype = self._decode_dtype()

            @jax.jit
            def decode_fn(state, latents):
                vae = nnx.merge(graphdef, state)
                z = vae.denormalize_latents(latents)
                # decode compute in the configured decode precision
                # (reference vae_decode_precision, bf16 by default); the
                # denormalize stays fp32-accurate above.
                return vae.decode(z.astype(dtype)).astype(jnp.float32)

            self._decode_fn = (decode_fn, state)
        return self._decode_fn

    def _pixel_elems(self, latents) -> int:
        """Estimated full-resolution activation element count."""
        b, _, t, h, w = latents.shape
        cfg = getattr(self.vae, "config", None)
        st = getattr(cfg, "scale_factor_temporal", 4) or 4
        ss = getattr(cfg, "scale_factor_spatial", 8) or 8
        base = getattr(cfg, "base_dim", 96) or 96
        return b * t * st * h * ss * w * ss * base

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if batch.extra.get("output_type") == "latent":
            batch.output = batch.latents
            return batch
        if (hasattr(self.vae, "decode_dispatched")
                and self._pixel_elems(batch.latents) > 7e8):
            # large clips: python-dispatched chunked decode with donated
            # conv caches bounds the HBM peak to one chunk's working set
            # (a single fused decode program OOMs a 16 GB chip next to the
            # resident DiT — see models/vaes/wan.py decode_dispatched).
            batch.output = self.vae.decode_dispatched(
                batch.latents.astype(jnp.float32), denormalize=True,
                decode_dtype=self._decode_dtype())
            return batch
        decode_fn, state = self._get_decode_fn()
        batch.output = decode_fn(state, batch.latents.astype(jnp.float32))
        return batch
