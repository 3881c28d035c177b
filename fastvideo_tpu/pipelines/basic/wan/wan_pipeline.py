"""Wan T2V / I2V / DMD pipelines.

Analog of /root/reference/fastvideo/pipelines/basic/wan/wan_pipeline.py
(:19-60) and wan_dmd_pipeline.py. Wan always denoises with FlowUniPC
(reference wan_pipeline.py:28 swaps the checkpoint scheduler out).
"""

from __future__ import annotations

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.models.schedulers.flow_unipc import (
    FlowUniPCMultistepScheduler)
from fastvideo_tpu.pipelines.composed import ComposedPipelineBase
from fastvideo_tpu.pipelines.lora_pipeline import LoRAPipelineMixin
from fastvideo_tpu.pipelines.stages.decoding import DecodingStage
from fastvideo_tpu.pipelines.stages.denoising import (DenoisingStage,
                                                      DmdDenoisingStage)
from fastvideo_tpu.pipelines.stages.input_validation import (
    InputValidationStage)
from fastvideo_tpu.pipelines.stages.latent_preparation import (
    LatentPreparationStage)
from fastvideo_tpu.pipelines.stages.text_encoding import TextEncodingStage
from fastvideo_tpu.pipelines.stages.timestep_preparation import (
    TimestepPreparationStage)


class WanPipeline(ComposedPipelineBase, LoRAPipelineMixin):
    _required_config_modules = [
        "text_encoder", "tokenizer", "vae", "transformer", "scheduler"
    ]

    def initialize_pipeline(self, fastvideo_args: FastVideoArgs) -> None:
        # Wan denoises with FlowUniPC regardless of checkpoint scheduler
        # (reference wan_pipeline.py:28-44).
        self.modules["scheduler"] = FlowUniPCMultistepScheduler(
            shift=self.pipeline_config.flow_shift or 1.0)

    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        cfg = self.pipeline_config
        self.add_stage("input_validation_stage", InputValidationStage())
        self.add_stage(
            "prompt_encoding_stage",
            TextEncodingStage(
                text_encoders=[self.get_module("text_encoder")],
                tokenizers=[self.get_module("tokenizer")],
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
                       DenoisingStage(self.get_module("transformer"),
                                      self.get_module("scheduler"), cfg,
                                      self.get_module("transformer_2"),
                                      vae=(self.get_module("vae")
                                           if cfg.ti2v_task else None)))
        self.add_stage("decoding_stage",
                       DecodingStage(self.get_module("vae"), cfg))


class WanDMDPipeline(WanPipeline):
    """3-step DMD distilled sampling (reference wan_dmd_pipeline.py)."""

    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        super().create_pipeline_stages(fastvideo_args)
        # swap the denoising stage for the DMD variant
        dmd = DmdDenoisingStage(self.get_module("transformer"),
                                self.get_module("scheduler"),
                                self.pipeline_config)
        self._stages[self._stages.index(self.denoising_stage)] = dmd
        self.denoising_stage = dmd
        self._stage_name_mapping["denoising_stage"] = dmd


class WanImageToVideoPipeline(WanPipeline):
    _required_config_modules = [
        "text_encoder", "tokenizer", "vae", "transformer", "scheduler",
        "image_encoder", "image_processor"
    ]

    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        from fastvideo_tpu.pipelines.stages.image_encoding import (
            ImageEncodingStage, WanImageVAEEncodingStage)

        super().create_pipeline_stages(fastvideo_args)
        # insert image conditioning after text encoding
        img_clip = ImageEncodingStage(self.get_module("image_encoder"))
        img_vae = WanImageVAEEncodingStage(self.get_module("vae"),
                                           self.pipeline_config.vae_config)
        pos = self._stages.index(self.timestep_preparation_stage)
        self._stages[pos:pos] = [img_clip, img_vae]
        self._stage_name_mapping["image_encoding_stage"] = img_clip
        self._stage_name_mapping["image_vae_encoding_stage"] = img_vae
        self.image_encoding_stage = img_clip
        self.image_vae_encoding_stage = img_vae


class WanCausalDMDPipeline(WanPipeline):
    """Self-forcing causal generation (reference wan_causal_dmd_pipeline)."""

    def initialize_pipeline(self, fastvideo_args: FastVideoArgs) -> None:
        from fastvideo_tpu.models.schedulers.flow_match_euler import (
            FlowMatchEulerDiscreteScheduler)

        self.modules["scheduler"] = FlowMatchEulerDiscreteScheduler(
            shift=self.pipeline_config.flow_shift or 5.0)

    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        from fastvideo_tpu.pipelines.stages.causal_denoising import (
            CausalDenoisingStage)

        super().create_pipeline_stages(fastvideo_args)
        causal = CausalDenoisingStage(self.get_module("transformer"),
                                      self.get_module("scheduler"),
                                      self.pipeline_config)
        self._stages[self._stages.index(self.denoising_stage)] = causal
        self.denoising_stage = causal
        self._stage_name_mapping["denoising_stage"] = causal


EntryClass = [WanPipeline, WanDMDPipeline, WanImageToVideoPipeline,
              WanCausalDMDPipeline]
