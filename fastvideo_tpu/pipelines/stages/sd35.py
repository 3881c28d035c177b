"""SD3.5 text-to-image stages.

Analog of /root/reference/fastvideo/pipelines/stages/sd35_conditioning.py
(:20-340) and timestep_preparation.py:136-175: latent prep on a single
frame, CLIP(pad)+T5 sequence concat with dual pooled projections, CFG
denoising over the 2D transformer, AutoencoderKL decode with
scaling/shift denormalization, and dynamic-shift (mu) timesteps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.stages.base import PipelineStage
from fastvideo_tpu.pipelines.stages.latent_preparation import (
    randn_like_reference)
from fastvideo_tpu.pipelines.stages.timestep_preparation import (
    TimestepPreparationStage)


def calculate_shift_mu(image_seq_len: int, base_seq_len: int = 256,
                       max_seq_len: int = 4096, base_shift: float = 0.5,
                       max_shift: float = 1.15) -> float:
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return float(image_seq_len) * m + b


class SD35TimestepPreparationStage(TimestepPreparationStage):
    """Dynamic shifting: mu from the image token count."""

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if getattr(self.scheduler, "use_dynamic_shifting", False):
            cfg = self.pipeline_config
            spatial = cfg.vae_config.arch_config.spatial_compression_ratio
            patch = cfg.dit_config.arch_config.patch_size
            seq_len = (batch.height // spatial // patch) * (
                batch.width // spatial // patch)
            mu = calculate_shift_mu(seq_len)
            self.scheduler.set_timesteps(batch.num_inference_steps, mu=mu)
            batch.timesteps = self.scheduler.timesteps
            return batch
        return super().forward(batch, fastvideo_args)


class SD35LatentPreparationStage(PipelineStage):
    def __init__(self, scheduler=None, transformer=None, vae_config=None,
                 dit_config=None):
        self.scheduler = scheduler
        self.vae_config = vae_config
        self.dit_config = dit_config

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if batch.latents is not None:
            return batch
        spatial = self.vae_config.arch_config.spatial_compression_ratio
        in_channels = self.dit_config.arch_config.in_channels
        batch_size = len(batch.seeds or [0])
        shape = (batch_size, in_channels, batch.height // spatial,
                 batch.width // spatial)
        noise = randn_like_reference(shape, batch.seeds or [batch.seed or 0])
        batch.latents = jnp.asarray(noise)
        batch.raw_latent_shape = shape
        return batch


class SD35ConditioningStage(PipelineStage):
    """Combine 2x CLIP + T5 into joint sequence + pooled projections."""

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if len(batch.prompt_embeds) < 3:
            raise ValueError("SD3.5 needs 3 prompt_embeds (2x CLIP + T5), "
                             f"got {len(batch.prompt_embeds)}")

        def combine(embeds, pooled_list):
            clip = jnp.concatenate(embeds[:2], axis=-1)
            t5 = embeds[2]
            clip = jnp.pad(clip,
                           ((0, 0), (0, 0),
                            (0, t5.shape[-1] - clip.shape[-1])))
            seq = jnp.concatenate([clip, t5], axis=-2)
            pooled = jnp.concatenate(pooled_list, axis=-1)
            return seq, pooled

        pooled = batch.extra.get("pooled_embeds")
        if pooled is None:
            raise ValueError("TextEncodingStage must record pooled_embeds "
                             "for SD3.5 (CLIP pooler outputs)")
        seq, pool = combine(batch.prompt_embeds, pooled[:2])
        batch.extra["sd35_encoder_hidden_states"] = seq
        batch.extra["sd35_pooled_projections"] = pool
        if batch.do_classifier_free_guidance and batch.negative_prompt_embeds:
            neg_pooled = batch.extra.get("negative_pooled_embeds")
            nseq, npool = combine(batch.negative_prompt_embeds,
                                  neg_pooled[:2])
            batch.extra["sd35_negative_encoder_hidden_states"] = nseq
            batch.extra["sd35_negative_pooled_projections"] = npool
        return batch


class SD35DenoisingStage(PipelineStage):
    def __init__(self, transformer, scheduler, pipeline_config=None):
        self.transformer = transformer
        self.scheduler = scheduler
        self.pipeline_config = pipeline_config
        self._step = None

    def _get_step(self):
        if self._step is None:
            graphdef, state = nnx.split(self.transformer)

            @jax.jit
            def step(state, latents, ctx, pooled, t):
                m = nnx.merge(graphdef, state)
                return m(latents, ctx, t, pooled_projections=pooled)

            self._step = (step, state)
        return self._step

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        target_dtype = jnp.bfloat16 if (
            self.pipeline_config is None
            or self.pipeline_config.precision == "bf16") else jnp.float32
        latents = batch.latents
        ctx = batch.extra["sd35_encoder_hidden_states"].astype(target_dtype)
        pooled = batch.extra["sd35_pooled_projections"].astype(target_dtype)
        neg_ctx = batch.extra.get("sd35_negative_encoder_hidden_states")
        neg_pooled = batch.extra.get("sd35_negative_pooled_projections")
        do_cfg = (batch.do_classifier_free_guidance and neg_ctx is not None)
        guidance = batch.guidance_scale
        step, state = self._get_step()
        for t in list(batch.timesteps):
            t_arr = jnp.full((latents.shape[0],), float(t), jnp.float32)
            model_in = latents.astype(target_dtype)
            pred = step(state, model_in, ctx, pooled, t_arr)
            if do_cfg:
                uncond = step(state, model_in,
                              neg_ctx.astype(target_dtype),
                              neg_pooled.astype(target_dtype), t_arr)
                pred = uncond + guidance * (pred - uncond)
            latents = self.scheduler.step(pred.astype(jnp.float32), t,
                                          latents.astype(
                                              jnp.float32)).prev_sample
        batch.latents = latents
        return batch


class SD35DecodingStage(PipelineStage):
    def __init__(self, vae, pipeline_config=None):
        self.vae = vae
        self.pipeline_config = pipeline_config
        self._decode = None

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if self._decode is None:
            graphdef, state = nnx.split(self.vae)

            @jax.jit
            def decode(state, z):
                m = nnx.merge(graphdef, state)
                return m.decode(m.denormalize_latents(z))

            self._decode = (decode, state)
        decode, state = self._decode
        image = decode(state, batch.latents.astype(jnp.float32))
        # [B, 3, H, W] -> single-frame video layout [B, 3, 1, H, W]
        batch.output = image[:, :, None]
        return batch
