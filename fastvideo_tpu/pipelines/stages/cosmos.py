"""Cosmos denoising stages (EDM-preconditioned flow sampling).

Analog of /root/reference/fastvideo/pipelines/stages/denoising.py:745-990
and latent_preparation.py:178-330: Karras-sigma FlowMatchEuler loop with
manual EDM preconditioning (c_in/c_skip/c_out), optional conditioning
frame injection (V2W), condition-mask channel, x0 -> velocity conversion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.stages.base import PipelineStage
from fastvideo_tpu.pipelines.stages.latent_preparation import (
    LatentPreparationStage, randn_like_reference)


class CosmosLatentPreparationStage(LatentPreparationStage):
    """Initial noise at sigma_max (EDM convention: x = noise * sigma_max)."""

    def __init__(self, scheduler=None, transformer=None, vae_config=None):
        super().__init__(scheduler, transformer, vae_config)

    def latent_shape(self, batch: ForwardBatch) -> tuple[int, ...]:
        # Cosmos transformer in_channels includes the condition mask
        z = self.transformer.config.in_channels - 1
        sf_t, sf_s = 4, 8
        if self.vae_config is not None:
            arch = self.vae_config.arch_config
            sf_t = arch.scale_factor_temporal
            sf_s = arch.scale_factor_spatial
        nf = (batch.num_frames - 1) // sf_t + 1
        bsz = len(batch.seeds or [0])
        return (bsz, z, nf, batch.height // sf_s, batch.width // sf_s)

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if batch.latents is not None:
            return batch
        shape = self.latent_shape(batch)
        noise = randn_like_reference(shape, batch.seeds or [batch.seed or 0])
        sigma_max = float(getattr(self.scheduler, "sigma_max", 80.0))
        batch.latents = jnp.asarray(noise) * sigma_max
        batch.raw_latent_shape = shape
        return batch


class CosmosDenoisingStage(PipelineStage):
    def __init__(self, transformer, scheduler, pipeline_config=None):
        self.transformer = transformer
        self.scheduler = scheduler
        self.pipeline_config = pipeline_config
        self._step = None

    def _get_step(self):
        if self._step is None:
            graphdef, state = nnx.split(self.transformer)

            @jax.jit
            def step(state, latents, ctx, t, cond_mask):
                m = nnx.merge(graphdef, state)
                return m(latents, ctx, t, condition_mask=cond_mask)

            self._step = (step, state)
        return self._step

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        target_dtype = jnp.bfloat16 if (
            self.pipeline_config is None
            or self.pipeline_config.precision == "bf16") else jnp.float32
        latents = batch.latents.astype(jnp.float32)
        pos_ctx = batch.prompt_embeds[0].astype(target_dtype)
        neg_ctx = (batch.negative_prompt_embeds[0].astype(target_dtype)
                   if batch.negative_prompt_embeds else None)
        do_cfg = batch.do_classifier_free_guidance and neg_ctx is not None
        guidance = float(batch.guidance_scale)
        sigma_data = float(getattr(self.scheduler, "sigma_data", 1.0))

        self.scheduler.set_timesteps(batch.num_inference_steps)
        sigmas = np.asarray(self.scheduler.sigmas, dtype=np.float64)
        if (getattr(self.scheduler, "final_sigmas_type", "sigma_min")
                == "sigma_min" and len(sigmas) > 1):
            # clamp terminal sigma (reference denoising.py:818-821)
            sigmas[-1] = sigmas[-2]
            self.scheduler.sigmas = sigmas.astype(np.float32)
        timesteps = np.asarray(self.scheduler.timesteps)
        batch.timesteps = timesteps

        b, c, tf, h, w = latents.shape
        cond_mask = jnp.zeros((b, 1, tf, h, w), target_dtype)
        step, state = self._get_step()

        for i, t in enumerate(timesteps):
            sigma = float(sigmas[i])
            # EDM preconditioning (reference :875-879)
            c_in = 1.0 / (sigma**2 + sigma_data**2)**0.5
            c_skip = sigma_data**2 / (sigma**2 + sigma_data**2)
            c_out = sigma * sigma_data / (sigma**2 + sigma_data**2)**0.5
            t_arr = jnp.full((b,), float(t), jnp.float32)
            model_in = (latents * c_in).astype(target_dtype)
            pred = step(state, model_in, pos_ctx, t_arr,
                        cond_mask).astype(jnp.float32)
            cond_x0 = c_skip * latents + c_out * pred
            if do_cfg:
                upred = step(state, model_in, neg_ctx, t_arr,
                             cond_mask).astype(jnp.float32)
                uncond_x0 = c_skip * latents + c_out * upred
                final_x0 = cond_x0 + guidance * (cond_x0 - uncond_x0)
            else:
                final_x0 = cond_x0
            # x0 -> velocity for the flow-match Euler update (:958-967)
            velocity = (latents - final_x0) / max(sigma, 1e-6)
            latents = self.scheduler.step(velocity, float(t),
                                          latents).prev_sample.astype(
                                              jnp.float32)
        batch.latents = latents
        return batch


class Cosmos25DenoisingStage(PipelineStage):
    """Cosmos-Predict2.5 flow-match denoising (reference
    stages/denoising.py:993-1201): the model predicts VELOCITY directly
    (no EDM preconditioning), timesteps pass as t * 0.001 in model units
    with per-frame support, CFG combines uncond + g * (cond - uncond),
    and a zero condition mask / unit padding mask feed the T2W path."""

    def __init__(self, transformer, scheduler, pipeline_config=None):
        self.transformer = transformer
        self.scheduler = scheduler
        self.pipeline_config = pipeline_config
        self._step = None

    def _get_step(self):
        if self._step is None:
            graphdef, state = nnx.split(self.transformer)

            @jax.jit
            def step(state, latents, ctx, t, fps):
                m = nnx.merge(graphdef, state)
                return m(latents, ctx, t, fps=fps)

            self._step = (step, state)
        return self._step

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        target_dtype = jnp.bfloat16 if (
            self.pipeline_config is None
            or self.pipeline_config.precision == "bf16") else jnp.float32
        latents = batch.latents.astype(jnp.float32)
        pos_ctx = batch.prompt_embeds[0].astype(target_dtype)
        neg_ctx = (batch.negative_prompt_embeds[0].astype(target_dtype)
                   if batch.negative_prompt_embeds else None)
        do_cfg = batch.do_classifier_free_guidance and neg_ctx is not None
        guidance = float(batch.guidance_scale)

        shift = (self.pipeline_config.flow_shift
                 if self.pipeline_config is not None else 5.0) or 5.0
        self.scheduler.set_timesteps(batch.num_inference_steps)
        timesteps = np.asarray(self.scheduler.timesteps)
        batch.timesteps = timesteps
        del shift  # scheduler carries the shift from pipeline init

        b = latents.shape[0]
        fps = float(batch.fps or 16)
        step, state = self._get_step()
        for t in timesteps:
            # model units: t * 0.001 (reference :1090)
            t_model = jnp.full((b, 1), float(t) * 0.001, jnp.float32)
            pred = step(state, latents.astype(target_dtype), pos_ctx,
                        t_model, fps).astype(jnp.float32)
            if do_cfg:
                upred = step(state, latents.astype(target_dtype), neg_ctx,
                             t_model, fps).astype(jnp.float32)
                v = upred + guidance * (pred - upred)
            else:
                v = pred
            latents = self.scheduler.step(v, float(t),
                                          latents).prev_sample.astype(
                                              jnp.float32)
        batch.latents = latents
        return batch
