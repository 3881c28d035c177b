"""FLUX.2 text-to-image stages.

Analog of /root/reference/fastvideo/pipelines/basic/flux_2/
flux_2_{latent,timestep}_preparation.py and stages/decoding.py:100-143:
packed 2x2 latents (transformer sees 4*z channels at half latent
resolution), BFL empirical-mu shifted flow-match sigmas, and a decode
path that BN-denormalizes the packed latents with the VAE's running
stats before unpatchify + decode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.stages.base import PipelineStage
from fastvideo_tpu.pipelines.stages.flux import pack_latents, unpack_latents
from fastvideo_tpu.pipelines.stages.latent_preparation import (
    randn_like_reference)


def compute_empirical_mu(image_seq_len: int, num_steps: int) -> float:
    """BFL resolution-dependent mu (reference
    flux_2_timestep_preparation.py:15-30)."""
    a1, b1 = 8.73809524e-05, 1.89833333
    a2, b2 = 0.00016927, 0.45666666
    if image_seq_len > 4300:
        return float(a2 * image_seq_len + b2)
    m_200 = a2 * image_seq_len + b2
    m_10 = a1 * image_seq_len + b1
    a = (m_200 - m_10) / 190.0
    b = m_200 - 200.0 * a
    return float(a * num_steps + b)


class Flux2TimestepPreparationStage(PipelineStage):
    def __init__(self, scheduler, pipeline_config=None):
        self.scheduler = scheduler
        self.pipeline_config = pipeline_config

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        import numpy as np

        n = batch.num_inference_steps
        spatial = (self.pipeline_config.vae_config.arch_config
                   .spatial_compression_ratio)
        seq_len = (batch.height // spatial // 2) * (
            batch.width // spatial // 2)
        sigmas = np.linspace(1.0, 1.0 / n, n)
        mu = compute_empirical_mu(seq_len, n)
        self.scheduler.set_timesteps(n, sigmas=sigmas, mu=mu)
        batch.timesteps = self.scheduler.timesteps
        return batch


class Flux2LatentPreparationStage(PipelineStage):
    def __init__(self, scheduler=None, vae_config=None, dit_config=None):
        self.scheduler = scheduler
        self.vae_config = vae_config
        self.dit_config = dit_config

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        spatial = self.vae_config.arch_config.spatial_compression_ratio
        c = self.dit_config.arch_config.in_channels // 4
        h_lat, w_lat = batch.height // spatial, batch.width // spatial
        batch_size = len(batch.seeds or [0])
        shape = (batch_size, c, h_lat, w_lat)
        if batch.latents is None:
            noise = randn_like_reference(shape,
                                         batch.seeds or [batch.seed or 0])
            latents = jnp.asarray(noise)
        else:
            latents = batch.latents
        batch.latents = pack_latents(latents, h_lat, w_lat)
        batch.raw_latent_shape = shape
        batch.extra["flux_hw_lat"] = (h_lat, w_lat)
        from fastvideo_tpu.models.dits.flux_2 import flux2_image_ids
        batch.extra["flux2_img_ids"] = jnp.asarray(
            flux2_image_ids(h_lat // 2, w_lat // 2))
        return batch


class Flux2DenoisingStage(PipelineStage):
    """Mistral/Qwen3 sequence conditioning only (no pooled stream);
    embedded distilled guidance (reference flux_2_pipeline.py +
    stages/denoising.py)."""

    def __init__(self, transformer, scheduler, pipeline_config=None):
        self.transformer = transformer
        self.scheduler = scheduler
        self.pipeline_config = pipeline_config
        self._step = None

    def _get_step(self):
        if self._step is None:
            graphdef, state = nnx.split(self.transformer)

            @jax.jit
            def step(state, packed, ctx, t, guidance, img_ids):
                m = nnx.merge(graphdef, state)
                return m(packed, ctx, t, img_ids=img_ids, guidance=guidance)

            self._step = (step, state)
        return self._step

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        target_dtype = jnp.bfloat16 if (
            self.pipeline_config is None
            or self.pipeline_config.precision == "bf16") else jnp.float32
        packed = batch.latents
        ctx = batch.prompt_embeds[0].astype(target_dtype)
        guidance_embeds = getattr(self.transformer.config, "guidance_embeds",
                                  False)
        b = packed.shape[0]
        embedded = (self.pipeline_config.embedded_cfg_scale
                    if self.pipeline_config is not None else None)
        gval = float(embedded if embedded is not None
                     else batch.guidance_scale)
        guidance = (jnp.full((b,), gval, jnp.float32)
                    if guidance_embeds else None)
        step, state = self._get_step()
        num_train = self.scheduler.num_train_timesteps
        for t in list(batch.timesteps):
            # the model multiplies by 1000 internally; pass sigma-scale t
            t_model = jnp.full((b,), float(t) / num_train, jnp.float32)
            pred = step(state, packed.astype(target_dtype), ctx, t_model,
                        guidance, batch.extra["flux2_img_ids"])
            packed = self.scheduler.step(pred.astype(jnp.float32), t,
                                         packed.astype(
                                             jnp.float32)).prev_sample
        batch.latents = packed
        return batch


class Flux2DecodingStage(PipelineStage):
    """BN denorm (running stats) -> unpack -> VAE decode (reference
    stages/decoding.py:121-143)."""

    def __init__(self, vae, pipeline_config=None):
        self.vae = vae
        self.pipeline_config = pipeline_config
        self._decode = None

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        h_lat, w_lat = batch.extra["flux_hw_lat"]
        c = batch.raw_latent_shape[1]
        if self._decode is None:
            graphdef, state = nnx.split(self.vae)

            # geometry is an ARGUMENT (static), never closed over: a
            # cached closure baked in the first request's h_lat/w_lat and
            # silently scrambled any later request whose packed length
            # collided (e.g. 1024x1024 vs 2048x512)
            @functools.partial(jax.jit, static_argnames=("h", "w", "cc"))
            def decode(state, packed_seq, h, w, cc):
                m = nnx.merge(graphdef, state)
                # [B, S, 4c] -> [B, 4c, h/2, w/2] for the BN stats
                b = packed_seq.shape[0]
                x = packed_seq.reshape(b, h // 2, w // 2, 4 * cc)
                x = m.bn_denormalize(x.transpose(0, 3, 1, 2))
                x = x.transpose(0, 2, 3, 1).reshape(b, -1, 4 * cc)
                z = unpack_latents(x, cc, h, w)
                return m.decode(z)

            self._decode = (decode, state)
        decode, state = self._decode
        image = decode(state, batch.latents.astype(jnp.float32),
                       int(h_lat), int(w_lat), int(c))
        batch.output = image[:, :, None]  # [B, 3, 1, H, W]
        return batch
