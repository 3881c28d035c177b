"""FLUX.1 text-to-image stages.

Analog of /root/reference/fastvideo/pipelines/stages/flux_stages.py
(:24-420): 2x2 latent packing with (0, y, x) position ids, CLIP pooled +
T5 sequence conditioning, embedded distilled guidance (optional true CFG),
dynamic-shift timesteps, unpack + AutoencoderKL decode.
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
    randn_like_reference)
from fastvideo_tpu.pipelines.stages.sd35 import (SD35TimestepPreparationStage,
                                                 calculate_shift_mu)


def pack_latents(latents, h_lat: int, w_lat: int):
    """[B, C, H, W] -> [B, (H/2)(W/2), C*4] (diffusers _pack_latents)."""
    b, c = latents.shape[:2]
    x = latents.reshape(b, c, h_lat // 2, 2, w_lat // 2, 2)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, (h_lat // 2) * (w_lat // 2), c * 4)


def unpack_latents(packed, c: int, h_lat: int, w_lat: int):
    b = packed.shape[0]
    x = packed.reshape(b, h_lat // 2, w_lat // 2, c, 2, 2)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, h_lat, w_lat)


def latent_image_ids(h_p: int, w_p: int) -> np.ndarray:
    ids = np.zeros((h_p, w_p, 3), np.float32)
    ids[..., 1] += np.arange(h_p, dtype=np.float32)[:, None]
    ids[..., 2] += np.arange(w_p, dtype=np.float32)[None, :]
    return ids.reshape(h_p * w_p, 3)


class FluxTimestepPreparationStage(SD35TimestepPreparationStage):
    """mu from the PACKED image sequence length."""

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if getattr(self.scheduler, "use_dynamic_shifting", False):
            spatial = (self.pipeline_config.vae_config.arch_config
                       .spatial_compression_ratio)
            seq_len = (batch.height // spatial // 2) * (
                batch.width // spatial // 2)
            mu = calculate_shift_mu(seq_len)
            self.scheduler.set_timesteps(batch.num_inference_steps, mu=mu)
            batch.timesteps = self.scheduler.timesteps
            return batch
        return super().forward(batch, fastvideo_args)


class FluxLatentPreparationStage(PipelineStage):
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
        batch.extra["flux_img_ids"] = jnp.asarray(
            latent_image_ids(h_lat // 2, w_lat // 2))
        return batch


class FluxConditioningStage(PipelineStage):
    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if len(batch.prompt_embeds) < 2:
            raise ValueError("FLUX needs 2 prompt_embeds (CLIP pooled, T5)")
        batch.extra["flux_pooled"] = batch.prompt_embeds[0]
        batch.extra["flux_ctx"] = batch.prompt_embeds[1]
        if batch.do_classifier_free_guidance and batch.negative_prompt_embeds:
            batch.extra["flux_neg_pooled"] = batch.negative_prompt_embeds[0]
            batch.extra["flux_neg_ctx"] = batch.negative_prompt_embeds[1]
        return batch


class FluxDenoisingStage(PipelineStage):
    def __init__(self, transformer, scheduler, pipeline_config=None):
        self.transformer = transformer
        self.scheduler = scheduler
        self.pipeline_config = pipeline_config
        self._step = None

    def _get_step(self):
        if self._step is None:
            graphdef, state = nnx.split(self.transformer)

            @jax.jit
            def step(state, packed, ctx, pooled, t, guidance, img_ids):
                m = nnx.merge(graphdef, state)
                return m(packed, ctx, t, pooled_projections=pooled,
                         img_ids=img_ids, guidance=guidance)

            self._step = (step, state)
        return self._step

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        target_dtype = jnp.bfloat16 if (
            self.pipeline_config is None
            or self.pipeline_config.precision == "bf16") else jnp.float32
        packed = batch.latents
        ctx = batch.extra["flux_ctx"].astype(target_dtype)
        pooled = batch.extra["flux_pooled"].astype(target_dtype)
        img_ids = batch.extra["flux_img_ids"]
        neg_ctx = batch.extra.get("flux_neg_ctx")
        neg_pooled = batch.extra.get("flux_neg_pooled")
        true_cfg = float(batch.extra.get("true_cfg_scale", 1.0))
        use_true_cfg = (batch.do_classifier_free_guidance and true_cfg > 1.0
                        and neg_ctx is not None)
        guidance_embeds = getattr(self.transformer.config, "guidance_embeds",
                                  False)
        b = packed.shape[0]
        guidance = (jnp.full((b,), float(batch.guidance_scale), jnp.float32)
                    if guidance_embeds else None)
        step, state = self._get_step()
        num_train = self.scheduler.num_train_timesteps
        for t in list(batch.timesteps):
            # the model multiplies by 1000 internally; pass sigma-scale t
            t_model = jnp.full((b,), float(t) / num_train, jnp.float32)
            model_in = packed.astype(target_dtype)
            pred = step(state, model_in, ctx, pooled, t_model, guidance,
                        img_ids)
            if use_true_cfg:
                neg = step(state, model_in, neg_ctx.astype(target_dtype),
                           neg_pooled.astype(target_dtype), t_model,
                           guidance, img_ids)
                pred = neg + true_cfg * (pred - neg)
            packed = self.scheduler.step(pred.astype(jnp.float32), t,
                                         packed.astype(
                                             jnp.float32)).prev_sample
        batch.latents = packed
        return batch


class FluxDecodingStage(PipelineStage):
    def __init__(self, vae, pipeline_config=None):
        self.vae = vae
        self.pipeline_config = pipeline_config
        self._decode = None

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        h_lat, w_lat = batch.extra["flux_hw_lat"]
        c = batch.raw_latent_shape[1]
        latents = unpack_latents(batch.latents, c, h_lat, w_lat)
        if self._decode is None:
            graphdef, state = nnx.split(self.vae)

            @jax.jit
            def decode(state, z):
                m = nnx.merge(graphdef, state)
                return m.decode(m.denormalize_latents(z))

            self._decode = (decode, state)
        decode, state = self._decode
        image = decode(state, latents.astype(jnp.float32))
        batch.output = image[:, :, None]  # [B, 3, 1, H, W]
        return batch
