"""Z-Image text-to-image pipeline.

Analog of /root/reference/fastvideo/pipelines/basic/zimage/
(zimage_pipeline.py:20-67 + stages.py:44-330): Qwen3 hidden-state -2
conditioning, dynamic-mu flow-match timesteps, a denoising loop that
feeds the transformer ``(1000 - t)/1000``, applies
``pos + g*(pos - neg)`` CFG with optional norm rescale, NEGATES the
prediction, and decodes through AutoencoderKL.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.forward_context import set_forward_context
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.composed import ComposedPipelineBase
from fastvideo_tpu.pipelines.stages.base import PipelineStage
from fastvideo_tpu.pipelines.stages.input_validation import (
    InputValidationStage)
from fastvideo_tpu.pipelines.stages.latent_preparation import (
    randn_like_reference)
from fastvideo_tpu.pipelines.stages.sd35 import (SD35DecodingStage,
                                                 calculate_shift_mu)
from fastvideo_tpu.pipelines.stages.text_encoding import TextEncodingStage
from fastvideo_tpu.pipelines.stages.timestep_preparation import (
    TimestepPreparationStage)


class ZImageConditioningStage(PipelineStage):
    """Trim the tokenizer's max-length padding off the Qwen states
    (reference stages.py:44-84 trims per sample; we trim to the batch
    max actual length — uniform shapes keep the program static)."""

    @staticmethod
    def _trim(embeds, mask):
        if mask is None:
            return embeds
        import numpy as np

        lengths = np.asarray(mask).sum(axis=1)
        keep = max(int(lengths.max()), 1)
        return embeds[:, :keep]

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if batch.prompt_embeds:
            mask = (batch.prompt_attention_mask[0]
                    if batch.prompt_attention_mask else None)
            batch.prompt_embeds[0] = self._trim(batch.prompt_embeds[0], mask)
        if batch.negative_prompt_embeds:
            mask = (batch.negative_attention_mask[0]
                    if batch.negative_attention_mask else None)
            batch.negative_prompt_embeds[0] = self._trim(
                batch.negative_prompt_embeds[0], mask)
        return batch


class ZImageLatentPreparationStage(PipelineStage):
    """fp32 noise latents [B, C, 1, h, w] (reference stages.py:87-142)."""

    def __init__(self, vae_config=None, dit_config=None):
        self.vae_config = vae_config
        self.dit_config = dit_config

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if batch.latents is not None:
            return batch
        spatial = self.vae_config.arch_config.spatial_compression_ratio
        c = self.dit_config.arch_config.in_channels
        shape = (len(batch.seeds or [0]), c, 1, batch.height // spatial,
                 batch.width // spatial)
        noise = randn_like_reference(shape, batch.seeds or [batch.seed or 0])
        batch.latents = jnp.asarray(noise)
        batch.raw_latent_shape = shape
        return batch


class ZImageTimestepPreparationStage(TimestepPreparationStage):
    """Dynamic mu from the packed image token count
    (reference stages.py:143-200)."""

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        cfg = self.pipeline_config
        spatial = cfg.vae_config.arch_config.spatial_compression_ratio
        seq_len = (batch.height // spatial // 2) * (
            batch.width // spatial // 2)
        mu = calculate_shift_mu(seq_len)
        if getattr(self.scheduler, "use_dynamic_shifting", False):
            self.scheduler.set_timesteps(batch.num_inference_steps, mu=mu)
        else:
            self.scheduler.set_timesteps(batch.num_inference_steps)
        batch.timesteps = self.scheduler.timesteps
        return batch


class ZImageDenoisingStage(PipelineStage):
    """(reference stages.py:201-297)."""

    def __init__(self, transformer, scheduler, pipeline_config=None):
        self.transformer = transformer
        self.scheduler = scheduler
        self.pipeline_config = pipeline_config
        self._step = None

    def _get_step_fn(self):
        if self._step is None:
            graphdef, state = nnx.split(self.transformer)

            @jax.jit
            def step_fn(state, latents, ctx, t):
                m = nnx.merge(graphdef, state)
                return m(latents, ctx, t)

            self._step = (step_fn, state)
        return self._step

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        target_dtype = jnp.bfloat16 if (
            self.pipeline_config is None
            or self.pipeline_config.precision == "bf16") else jnp.float32
        latents = batch.latents.astype(jnp.float32)
        pos = batch.prompt_embeds[0].astype(target_dtype)
        neg = (batch.negative_prompt_embeds[0].astype(target_dtype)
               if batch.negative_prompt_embeds else None)
        do_cfg = batch.do_classifier_free_guidance and neg is not None
        guidance = float(batch.guidance_scale)
        cfg_normalization = bool(batch.extra.get("cfg_normalization", False))

        step_fn, state = self._get_step_fn()
        timesteps = list(batch.timesteps)
        for i, t in enumerate(timesteps):
            if float(t) == 0.0 and i == len(timesteps) - 1:
                continue
            # transformer timestep convention (reference :231-233)
            t_model = (1000.0 - float(t)) / 1000.0
            t_arr = jnp.full((latents.shape[0],), t_model, jnp.float32)
            model_in = latents.astype(target_dtype)
            with set_forward_context(current_timestep=i,
                                     forward_batch=batch):
                out_pos = step_fn(state, model_in, pos, t_arr)
                if do_cfg:
                    out_neg = step_fn(state, model_in, neg, t_arr)
            if do_cfg:
                pos32 = out_pos.astype(jnp.float32)
                pred = pos32 + guidance * (pos32 -
                                           out_neg.astype(jnp.float32))
                if cfg_normalization:
                    pos_norm = jnp.linalg.norm(pos32)
                    pred_norm = jnp.linalg.norm(pred)
                    pred = jnp.where(pred_norm > pos_norm,
                                     pred * (pos_norm / pred_norm), pred)
                noise_pred = pred
            else:
                noise_pred = out_pos.astype(jnp.float32)
            noise_pred = -noise_pred
            latents = self.scheduler.step(noise_pred, t, latents).prev_sample
        batch.latents = latents
        return batch


class ZImageDecodingStage(SD35DecodingStage):
    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        # drop the T=1 axis for the 2D image VAE
        batch.latents = batch.latents[:, :, 0]
        return super().forward(batch, fastvideo_args)


class ZImagePipeline(ComposedPipelineBase):
    _required_config_modules = [
        "text_encoder", "tokenizer", "vae", "transformer", "scheduler"
    ]

    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        cfg = self.pipeline_config
        self.add_stage("input_validation_stage", InputValidationStage())
        self.add_stage(
            "prompt_encoding_stage",
            TextEncodingStage(
                text_encoders=[self.get_module("text_encoder")],
                tokenizers=[self.get_module("tokenizer")],
                preprocess_funcs=getattr(cfg, "preprocess_text_funcs", ()),
                postprocess_funcs=cfg.postprocess_text_funcs,
                encoder_kwargs=getattr(cfg, "text_encoder_extra_kwargs", ()),
            ))
        self.add_stage("zimage_conditioning_stage",
                       ZImageConditioningStage())
        self.add_stage("timestep_preparation_stage",
                       ZImageTimestepPreparationStage(
                           self.get_module("scheduler"), cfg))
        self.add_stage("latent_preparation_stage",
                       ZImageLatentPreparationStage(cfg.vae_config,
                                                    cfg.dit_config))
        self.add_stage("denoising_stage",
                       ZImageDenoisingStage(self.get_module("transformer"),
                                            self.get_module("scheduler"),
                                            cfg))
        self.add_stage("decoding_stage",
                       ZImageDecodingStage(self.get_module("vae"), cfg))


EntryClass = ZImagePipeline
