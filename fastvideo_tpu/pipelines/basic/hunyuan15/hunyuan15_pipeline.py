"""HunyuanVideo-1.5 T2V / I2V pipelines.

Analog of /root/reference/fastvideo/pipelines/basic/hunyuan15/
hunyuan15_pipeline.py:21-59 and hunyuan15_i2v_pipeline.py: dual text
streams (Qwen2.5-VL video-description template + ByT5 glyph stream),
FlowMatchEuler denoising (shift 5), Hunyuan-1.5 DCAE VAE decode. The I2V
variant encodes the conditioning image with SigLIP and concatenates the
first-frame latent condition on channels.
"""

from __future__ import annotations

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.pipelines.composed import ComposedPipelineBase
from fastvideo_tpu.pipelines.lora_pipeline import LoRAPipelineMixin
from fastvideo_tpu.pipelines.stages.decoding import DecodingStage
from fastvideo_tpu.pipelines.stages.denoising import DenoisingStage
from fastvideo_tpu.pipelines.stages.image_encoding import (
    Hy15ImageEncodingStage)
from fastvideo_tpu.pipelines.stages.base import PipelineStage
from fastvideo_tpu.pipelines.stages.input_validation import (
    InputValidationStage)
from fastvideo_tpu.pipelines.stages.latent_preparation import (
    LatentPreparationStage)
from fastvideo_tpu.pipelines.stages.text_encoding import TextEncodingStage
from fastvideo_tpu.pipelines.stages.timestep_preparation import (
    TimestepPreparationStage)


class HunyuanVideo15Pipeline(ComposedPipelineBase, LoRAPipelineMixin):
    _required_config_modules = [
        "text_encoder", "text_encoder_2", "tokenizer", "tokenizer_2",
        "vae", "transformer", "scheduler"
    ]

    def initialize_pipeline(self, fastvideo_args: FastVideoArgs) -> None:
        from fastvideo_tpu.models.schedulers.flow_match_euler import (
            FlowMatchEulerDiscreteScheduler)

        self.modules["scheduler"] = FlowMatchEulerDiscreteScheduler(
            shift=self.pipeline_config.flow_shift or 5.0)

    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        cfg = self.pipeline_config
        self.add_stage("input_validation_stage", InputValidationStage())
        self.add_stage(
            "prompt_encoding_stage",
            TextEncodingStage(
                text_encoders=[self.get_module("text_encoder"),
                               self.get_module("text_encoder_2")],
                tokenizers=[self.get_module("tokenizer"),
                            self.get_module("tokenizer_2")],
                preprocess_funcs=getattr(cfg, "preprocess_text_funcs", ()),
                postprocess_funcs=cfg.postprocess_text_funcs,
                max_lengths=getattr(cfg, "text_encoder_max_lengths", ()),
                encoder_kwargs=getattr(cfg, "text_encoder_extra_kwargs", ()),
            ))
        self.add_stage("timestep_preparation_stage",
                       TimestepPreparationStage(self.get_module("scheduler"),
                                                cfg))
        self.add_stage("latent_preparation_stage",
                       LatentPreparationStage(self.get_module("scheduler"),
                                              self.get_module("transformer"),
                                              cfg.vae_config))
        # hy1.5 always concats a [z+1]-channel cond latent (zeros for T2V);
        # the I2V subclass passes the image encoder + VAE for real encoding.
        self.add_stage(
            "image_encoding_stage",
            Hy15ImageEncodingStage(
                image_encoder=self.modules.get("image_encoder"),
                vae=self.modules.get("vae"),
                vae_config=cfg.vae_config))
        self.add_stage("denoising_stage",
                       DenoisingStage(self.get_module("transformer"),
                                      self.get_module("scheduler"), cfg))
        self.add_stage("decoding_stage",
                       DecodingStage(self.get_module("vae"), cfg))


class HunyuanVideo15I2VPipeline(HunyuanVideo15Pipeline):
    """I2V: the shared Hy15ImageEncodingStage encodes the conditioning
    image (SigLIP embeds + first-frame VAE latent) when the batch carries
    one (reference hunyuan15_i2v_pipeline.py)."""

    _required_config_modules = [
        "text_encoder", "text_encoder_2", "tokenizer", "tokenizer_2",
        "image_encoder", "vae", "transformer", "scheduler"
    ]


class _SRHandoffStage(PipelineStage):
    """Move the base-pass latents into ``lq_latents`` and switch the
    batch geometry to the SR grid (reference hunyuan15_sr_pipeline.py
    :102-107 does this inline in forward)."""

    def forward(self, batch, fastvideo_args):
        batch.lq_latents = batch.latents
        batch.latents = None
        batch.image_latent = None
        if batch.height_sr:
            batch.height = batch.height_sr
        if batch.width_sr:
            batch.width = batch.width_sr
        return batch


class HunyuanVideo15SRPipeline(HunyuanVideo15Pipeline):
    """Two-pass SR pipeline (reference hunyuan15_sr_pipeline.py:24-121):
    base denoise at (height, width), then an SR refinement pass on
    ``transformer_2`` conditioned on the upsampled low-res latents."""

    _required_config_modules = [
        "text_encoder", "text_encoder_2", "tokenizer", "tokenizer_2",
        "vae", "transformer", "transformer_2", "scheduler", "upsampler"
    ]

    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        from fastvideo_tpu.pipelines.stages.sr_denoising import (
            Hy15SRDenoisingStage)

        super().create_pipeline_stages(fastvideo_args)
        cfg = self.pipeline_config
        # re-order: the decode stage must run after the SR pass
        decoding = self._stages.pop()
        self.add_stage("sr_handoff_stage", _SRHandoffStage())
        self.add_stage(
            "sr_latent_preparation_stage",
            LatentPreparationStage(self.get_module("scheduler"),
                                   self.get_module("transformer_2"),
                                   cfg.vae_config))
        self.add_stage(
            "sr_image_encoding_stage",
            Hy15ImageEncodingStage(
                image_encoder=self.modules.get("image_encoder"),
                vae=self.modules.get("vae"),
                vae_config=cfg.vae_config))
        self.add_stage(
            "sr_denoising_stage",
            Hy15SRDenoisingStage(self.get_module("transformer_2"),
                                 self.get_module("scheduler"),
                                 self.get_module("upsampler"), cfg))
        self._stages.append(decoding)


EntryClass = HunyuanVideo15Pipeline
