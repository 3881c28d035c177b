"""GLM-Image (GLM-4.1V "CogView-style") text/image-to-image pipeline.

Behavioral reference:
/root/reference/fastvideo/pipelines/basic/glm_image/ (pipeline + stages).
The hybrid design: an autoregressive vision-language model generates
discrete prior tokens, a glyph-T5 encoder embeds quoted text spans, and a
flow-matching DiT denoises conditioned on both. The AR prior model is
OPTIONAL here (reference before_denoising.py:178-181 has the same
fallback): without it, priors are random-and-dropped, which matches the
reference's degraded T2I mode. I2I uses the DiT's KV-cache write/read
path over VAE-encoded condition latents; source prior tokens can be
supplied via ``extra['glm_prior_token_image_ids']`` when no AR model is
loaded.
"""

from __future__ import annotations

import math
import re

import jax
import jax.numpy as jnp
import numpy as np

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.forward_context import set_forward_context
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.models.schedulers.flow_match_euler import (
    FlowMatchEulerDiscreteScheduler)
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.composed import ComposedPipelineBase
from fastvideo_tpu.pipelines.lora_pipeline import LoRAPipelineMixin
from fastvideo_tpu.pipelines.stages.base import PipelineStage
from fastvideo_tpu.pipelines.stages.input_validation import (
    InputValidationStage)
from fastvideo_tpu.pipelines.stages.latent_preparation import (
    randn_like_reference)

logger = init_logger(__name__)

Array = jax.Array


def calculate_shift(image_seq_len: int, base_seq_len: int = 256,
                    base_shift: float = 0.25,
                    max_shift: float = 0.75) -> float:
    """Resolution-dependent flow shift (reference before_denoising.py:21)."""
    return (image_seq_len / base_seq_len) ** 0.5 * max_shift + base_shift


def get_glyph_texts(prompt: str) -> list[str]:
    """Quoted spans in the prompt are rendered-text candidates
    (reference before_denoising.py:30-42)."""
    return (re.findall(r"'([^']*)'", prompt) +
            re.findall(r"“([^“”]*)”", prompt) +
            re.findall(r'"([^"]*)"', prompt) +
            re.findall(r"「([^「」]*)」", prompt))


class GlmImageBeforeDenoisingStage(PipelineStage):
    """Priors (AR model or dropped randoms) + glyph-T5 embeds + latents +
    integer-cast timesteps with dynamic shift
    (reference stages/before_denoising.py)."""

    def __init__(self, text_encoder, tokenizer, transformer, scheduler,
                 vision_language_encoder=None, pipeline_config=None):
        self.text_encoder = text_encoder
        self.tokenizer = tokenizer
        self.transformer = transformer
        self.scheduler = scheduler
        self.vision_language_encoder = vision_language_encoder
        self.pipeline_config = pipeline_config

    def _glyph_embeds(self, prompt: str) -> Array:
        texts = get_glyph_texts(prompt) or [""]
        enc = self.tokenizer(texts, truncation=True, max_length=2048)
        pad_id = self.tokenizer.pad_token_id or 0
        # reference parity-pad (before_denoising.py:63): prepend pad tokens
        # (attended) so every span has odd length >= 1
        id_lists = [[pad_id] * ((len(ids) + 1) % 2) + list(ids)
                    for ids in enc["input_ids"]]
        max_l = max(len(ids) for ids in id_lists)
        ids = jnp.asarray([ids + [pad_id] * (max_l - len(ids))
                           for ids in id_lists])
        mask = jnp.asarray([[1] * len(ids_) + [0] * (max_l - len(ids_))
                            for ids_ in id_lists])
        out = self.text_encoder(ids, mask).last_hidden_state
        # flatten the per-span sequences, keeping only real tokens
        flat = out[np.asarray(mask, bool)]
        return flat[None]  # [1, L, C]

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        arch = self.pipeline_config.dit_config.arch_config
        th, tw = batch.height // 32, batch.width // 32
        prompt = (batch.prompt if isinstance(batch.prompt, str)
                  else batch.prompt[0])

        if self.vision_language_encoder is not None:
            prior, drop = self.vision_language_encoder.generate_priors(
                prompt, batch.pil_image, batch.height, batch.width,
                seed=batch.seed)
            batch.extra["glm_prior_token_id"] = prior
            batch.extra["glm_prior_token_drop"] = drop
        elif batch.extra.get("glm_prior_token_id") is None:
            logger.warning("No vision_language_encoder; using random "
                           "dropped priors (reference fallback).")
            rng = np.random.default_rng(batch.seed or 0)
            n = 4 * th * tw
            batch.extra["glm_prior_token_id"] = jnp.asarray(
                rng.integers(0, arch.prior_vq_quantizer_codebook_size,
                             (1, n)))
            batch.extra["glm_prior_token_drop"] = jnp.ones((1,), bool)
        else:
            batch.extra.setdefault("glm_prior_token_drop",
                                   jnp.zeros((1,), bool))

        # cond / uncond glyph embeds are kept SEPARATE (each at its
        # natural length) and the denoise loop runs two calls: the joint
        # [text|image] attention has no pad-mask plumbing, and left-pad
        # zeros would otherwise be attended as real tokens (the reference
        # instead threads attention_mask_kv through its kernel).
        batch.prompt_embeds = [self._glyph_embeds(prompt)]
        if batch.do_classifier_free_guidance:
            batch.extra["glm_neg_embeds"] = self._glyph_embeds(
                batch.negative_prompt or "")

        # GLM geometry is fixed: f8 VAE, p2 patches, d32 AR priors
        # upsampled to the d16 patch grid
        batch.latents = jnp.asarray(randn_like_reference(
            (1, arch.in_channels, 1, batch.height // 8, batch.width // 8),
            [batch.seed or 0]), jnp.float32)

        ntt = self.scheduler.num_train_timesteps
        p = arch.patch_size
        seq_len = (batch.height // 8) * (batch.width // 8) // (p * p)
        ts = np.linspace(ntt, 1.0, batch.num_inference_steps + 1)[:-1]
        ts = ts.astype(np.int64).astype(np.float32)
        self.scheduler.set_shift(calculate_shift(seq_len))
        self.scheduler.set_timesteps(batch.num_inference_steps,
                                     sigmas=ts / ntt, timesteps=ts)
        batch.timesteps = self.scheduler.timesteps
        return batch


class GlmImageConditionEncodingStage(PipelineStage):
    """I2I: VAE-encode the condition image and write it into the DiT's
    per-layer KV caches (reference stages/condition_encoding.py)."""

    MULT = 16  # vae factor 8 * patch 2

    def __init__(self, vae, transformer, pipeline_config):
        self.vae = vae
        self.transformer = transformer
        self.pipeline_config = pipeline_config

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if batch.pil_image is None:
            return batch
        from fastvideo_tpu.models.dits.glm_image import GlmImageKVCache

        prior_ids = batch.extra.get("glm_prior_token_image_ids")
        src_grid = batch.extra.get("glm_source_image_grid_thw")
        if prior_ids is None or src_grid is None:
            raise ValueError(
                "GLM I2I needs source prior tokens: load the AR "
                "vision_language_encoder or pass "
                "extra['glm_prior_token_image_ids'] + "
                "extra['glm_source_image_grid_thw']")
        prior_ids = jnp.asarray(prior_ids)
        if prior_ids.ndim == 1:
            prior_ids = prior_ids[None]
        cond_h = int(src_grid[0][1]) * self.MULT
        cond_w = int(src_grid[0][2]) * self.MULT

        img = np.asarray(batch.pil_image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 127.5 - 1.0
        if img.ndim == 3:
            img = img.transpose(2, 0, 1)[None]
        # resize to the source grid via nearest (host-side, tiny)
        ih = (np.arange(cond_h) * img.shape[2] / cond_h).astype(int)
        iw = (np.arange(cond_w) * img.shape[3] / cond_w).astype(int)
        img = img[:, :, ih][:, :, :, iw]

        # encoder moments are channels-last; DiT + stats are NCHW
        latent = self.vae.encode(jnp.asarray(img)).mode().transpose(
            0, 3, 1, 2)
        cfg = self.vae.config
        mean = jnp.asarray(cfg.latents_mean_arr()).reshape(1, -1, 1, 1)
        std = jnp.asarray(cfg.latents_std_arr()).reshape(1, -1, 1, 1)
        latent = (latent - mean) / std

        caches = GlmImageKVCache(
            num_layers=len(self.transformer.transformer_blocks))
        empty_text = jnp.zeros(
            (1, 0, batch.prompt_embeds[0].shape[-1]), jnp.float32)
        with set_forward_context(current_timestep=0, forward_batch=batch):
            self.transformer(
                latent.astype(jnp.bfloat16), empty_text, prior_ids,
                jnp.zeros((1,), bool), jnp.zeros((1,), jnp.float32),
                jnp.asarray([[cond_h, cond_w]], jnp.int32),
                jnp.zeros((1, 2), jnp.int32), kv_caches=caches,
                kv_caches_mode="write")
        batch.extra["glm_kv_caches"] = caches
        return batch


class GlmImageDenoisingStage(PipelineStage):
    """Flow-matching loop: 2-row CFG batch for T2I; separate cond
    (cache-read) / uncond (cache-skip) calls for I2I
    (reference stages/denoising.py)."""

    def __init__(self, transformer, scheduler, pipeline_config):
        self.transformer = transformer
        self.scheduler = scheduler
        self.pipeline_config = pipeline_config

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        gs = float(batch.guidance_scale)
        do_cfg = gs > 1.0
        latents = batch.latents
        if latents.ndim == 5:
            latents = latents[:, :, 0]
        embeds = batch.prompt_embeds[0].astype(jnp.bfloat16)
        neg_embeds = batch.extra.get("glm_neg_embeds")
        if neg_embeds is not None:
            neg_embeds = neg_embeds.astype(jnp.bfloat16)
        prior = jnp.asarray(batch.extra["glm_prior_token_id"])
        caches = batch.extra.get("glm_kv_caches")

        target = jnp.asarray([[batch.height, batch.width]], jnp.int32)
        crop = jnp.zeros((1, 2), jnp.int32)
        drop = jnp.asarray(batch.extra.get("glm_prior_token_drop",
                                           jnp.zeros((1,), bool)))

        for i, t in enumerate(np.asarray(batch.timesteps)):
            t_exp = jnp.full((1,), float(t) - 1.0, jnp.float32)
            with set_forward_context(current_timestep=i,
                                     forward_batch=batch):
                x = latents.astype(jnp.bfloat16)
                if caches is None:
                    # separate cond/uncond calls: glyph lengths differ,
                    # and the joint attention has no pad masking
                    pred = self.transformer(
                        x, embeds, prior[:1], drop, t_exp, target,
                        crop).astype(jnp.float32)
                    if do_cfg:
                        uncond = self.transformer(
                            x, neg_embeds, prior[:1],
                            jnp.ones((1,), bool), t_exp, target,
                            crop).astype(jnp.float32)
                        cond = pred
                        pred = uncond + gs * (cond - uncond)
                        if batch.guidance_rescale:
                            dims = tuple(range(1, cond.ndim))
                            std_t = jnp.std(cond, axis=dims, keepdims=True)
                            std_c = jnp.std(pred, axis=dims, keepdims=True)
                            pred = (batch.guidance_rescale * pred *
                                    (std_t / std_c) +
                                    (1 - batch.guidance_rescale) * pred)
                else:
                    pred = self.transformer(
                        x, embeds, prior[:1], jnp.zeros((1,), bool),
                        t_exp, target, crop, kv_caches=caches,
                        kv_caches_mode="read").astype(jnp.float32)
                    if do_cfg:
                        uncond = self.transformer(
                            x, neg_embeds if neg_embeds is not None
                            else embeds, prior[:1],
                            jnp.ones((1,), bool), t_exp, target, crop,
                            kv_caches=caches,
                            kv_caches_mode="skip").astype(jnp.float32)
                        pred = uncond + gs * (pred - uncond)
            latents = self.scheduler.step(pred, float(t),
                                          latents.astype(
                                              jnp.float32)).prev_sample
        if caches is not None:
            caches.clear()
        batch.latents = latents[:, :, None]
        return batch


class GlmImageDecodingStage(PipelineStage):
    """2D VAE decode -> [B, 3, 1, H, W] in [-1, 1]
    (reference stages/decoding.py maps to [0,1]; we keep the framework's
    [-1,1] convention — VideoGenerator's uint8 quantizer expects it)."""

    def __init__(self, vae, pipeline_config):
        self.vae = vae
        self.pipeline_config = pipeline_config

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if batch.extra.get("output_type") == "latent":
            batch.output = batch.latents
            return batch
        z = batch.latents
        if z.ndim == 5:
            z = z[:, :, 0]
        cfg = self.vae.config
        mean = jnp.asarray(cfg.latents_mean_arr()).reshape(1, -1, 1, 1)
        std = jnp.asarray(cfg.latents_std_arr()).reshape(1, -1, 1, 1)
        z = z.astype(jnp.float32) * std + mean
        img = self.vae.decode(z)
        batch.output = jnp.clip(img, -1, 1)[:, :, None]
        return batch


class GlmImagePipeline(ComposedPipelineBase, LoRAPipelineMixin):
    _required_config_modules = [
        "text_encoder", "tokenizer", "vae", "transformer", "scheduler"
    ]
    _optional_config_modules = ["vision_language_encoder", "processor"]

    def initialize_pipeline(self, fastvideo_args: FastVideoArgs) -> None:
        self.modules["scheduler"] = FlowMatchEulerDiscreteScheduler(
            shift=1.0)

    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        cfg = self.pipeline_config
        self.add_stage("input_validation_stage", InputValidationStage())
        self.add_stage(
            "before_denoising_stage",
            GlmImageBeforeDenoisingStage(
                self.get_module("text_encoder"),
                self.get_module("tokenizer"),
                self.get_module("transformer"),
                self.get_module("scheduler"),
                self.get_module("vision_language_encoder", None), cfg))
        self.add_stage(
            "condition_encoding_stage",
            GlmImageConditionEncodingStage(self.get_module("vae"),
                                           self.get_module("transformer"),
                                           cfg))
        self.add_stage(
            "denoising_stage",
            GlmImageDenoisingStage(self.get_module("transformer"),
                                   self.get_module("scheduler"), cfg))
        self.add_stage("decoding_stage",
                       GlmImageDecodingStage(self.get_module("vae"), cfg))


EntryClass = GlmImagePipeline
