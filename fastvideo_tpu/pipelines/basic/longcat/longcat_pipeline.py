"""LongCat-Video pipelines (T2V + I2V).

Analog of /root/reference/fastvideo/pipelines/basic/longcat/
longcat_pipeline.py (:26-123) and longcat_i2v_pipeline.py (:30-136):
single UMT5 text stream, Wan VAE, CFG-zero denoising with negated flow
prediction. I2V replaces the first latent frame with the VAE-encoded
image (mean/std normalized) and holds it fixed through denoising while
the transformer runs split attention over conditioning frames.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.composed import ComposedPipelineBase
from fastvideo_tpu.pipelines.lora_pipeline import LoRAPipelineMixin
from fastvideo_tpu.pipelines.stages.base import PipelineStage
from fastvideo_tpu.pipelines.stages.decoding import DecodingStage
from fastvideo_tpu.pipelines.stages.input_validation import (
    InputValidationStage)
from fastvideo_tpu.pipelines.stages.latent_preparation import (
    LatentPreparationStage, randn_like_reference)
from fastvideo_tpu.pipelines.stages.longcat_denoising import (
    LongCatDenoisingStage)
from fastvideo_tpu.pipelines.stages.text_encoding import TextEncodingStage
from fastvideo_tpu.pipelines.stages.timestep_preparation import (
    TimestepPreparationStage)


class LongCatImageVAEEncodingStage(PipelineStage):
    """Encode the conditioning image to one normalized latent frame
    (reference stages/longcat_image_vae_encoding.py:38-149)."""

    def __init__(self, vae, vae_config=None):
        self.vae = vae
        self.vae_config = vae_config

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        import PIL.Image

        if batch.pil_image is None and not batch.image_path:
            return batch
        image = batch.pil_image or PIL.Image.open(batch.image_path)
        img = image.convert("RGB").resize((batch.width, batch.height),
                                          PIL.Image.LANCZOS)
        arr = np.asarray(img, dtype=np.float32) / 127.5 - 1.0
        px = arr.transpose(2, 0, 1)[None, :, None]  # [1, 3, 1, H, W]

        dist = self.vae.encode(jnp.asarray(px))
        latent = dist.mean.transpose(0, 4, 1, 2, 3)  # NCDHW
        # LongCat normalization: (z - mean) / std (NOT scaling_factor)
        latent = self.vae.normalize_latents(latent)
        batch.image_latent = latent.astype(jnp.float32)
        batch.extra["num_cond_latents"] = 1
        return batch


class LongCatI2VLatentPreparationStage(LatentPreparationStage):
    """Noise latents with the first frame replaced by the image latent
    (reference stages/longcat_i2v_latent_preparation.py:30-95)."""

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if batch.latents is not None:
            return batch
        shape = self.latent_shape(batch)
        noise = randn_like_reference(shape, batch.seeds or [batch.seed or 0])
        latents = jnp.asarray(noise)
        num_cond = int(batch.extra.get("num_cond_latents", 0))
        if batch.image_latent is not None and num_cond > 0:
            latents = jnp.concatenate(
                [batch.image_latent[:, :, :num_cond].astype(latents.dtype),
                 latents[:, :, num_cond:]], axis=2)
        batch.latents = latents
        batch.raw_latent_shape = shape
        return batch


class LongCatPipeline(ComposedPipelineBase, LoRAPipelineMixin):
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
            ))
        self.add_stage("timestep_preparation_stage",
                       TimestepPreparationStage(self.get_module("scheduler"),
                                                cfg))
        self.add_stage("latent_preparation_stage",
                       LatentPreparationStage(self.get_module("scheduler"),
                                              self.get_module("transformer"),
                                              cfg.vae_config))
        self.add_stage("denoising_stage",
                       LongCatDenoisingStage(self.get_module("transformer"),
                                             self.get_module("scheduler"),
                                             cfg))
        self.add_stage("decoding_stage",
                       DecodingStage(self.get_module("vae"), cfg))


class LongCatImageToVideoPipeline(LongCatPipeline):
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
            ))
        self.add_stage(
            "image_vae_encoding_stage",
            LongCatImageVAEEncodingStage(self.get_module("vae"),
                                         cfg.vae_config))
        self.add_stage("timestep_preparation_stage",
                       TimestepPreparationStage(self.get_module("scheduler"),
                                                cfg))
        self.add_stage(
            "latent_preparation_stage",
            LongCatI2VLatentPreparationStage(self.get_module("scheduler"),
                                             self.get_module("transformer"),
                                             cfg.vae_config))
        self.add_stage("denoising_stage",
                       LongCatDenoisingStage(self.get_module("transformer"),
                                             self.get_module("scheduler"),
                                             cfg))
        self.add_stage("decoding_stage",
                       DecodingStage(self.get_module("vae"), cfg))


EntryClass = LongCatPipeline
