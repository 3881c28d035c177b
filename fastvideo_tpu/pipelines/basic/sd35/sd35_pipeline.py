"""SD3.5 text-to-image pipeline (single frame).

Analog of /root/reference/fastvideo/pipelines/basic/sd35/sd35_pipeline.py
(:22-115): triple text encoders, SD35 conditioning/denoise/decode stages,
FlowMatchEuler with dynamic shifting.
"""

from __future__ import annotations

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.pipelines.composed import ComposedPipelineBase
from fastvideo_tpu.pipelines.stages.input_validation import (
    InputValidationStage)
from fastvideo_tpu.pipelines.stages.sd35 import (SD35ConditioningStage,
                                                 SD35DecodingStage,
                                                 SD35DenoisingStage,
                                                 SD35LatentPreparationStage,
                                                 SD35TimestepPreparationStage)
from fastvideo_tpu.pipelines.stages.text_encoding import TextEncodingStage


class SD35Pipeline(ComposedPipelineBase):
    _required_config_modules = [
        "scheduler", "transformer", "vae",
        "text_encoder", "text_encoder_2", "text_encoder_3",
        "tokenizer", "tokenizer_2", "tokenizer_3",
    ]

    def initialize_pipeline(self, fastvideo_args: FastVideoArgs) -> None:
        from fastvideo_tpu.models.schedulers.flow_match_euler import (
            FlowMatchEulerDiscreteScheduler)

        sched = self.modules.get("scheduler")
        if sched is None or not getattr(sched, "use_dynamic_shifting",
                                        False):
            self.modules["scheduler"] = FlowMatchEulerDiscreteScheduler(
                shift=3.0, use_dynamic_shifting=True)

    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        cfg = self.pipeline_config
        self.add_stage("input_validation_stage", InputValidationStage())
        self.add_stage(
            "prompt_encoding_stage",
            TextEncodingStage(
                text_encoders=[self.get_module("text_encoder"),
                               self.get_module("text_encoder_2"),
                               self.get_module("text_encoder_3")],
                tokenizers=[self.get_module("tokenizer"),
                            self.get_module("tokenizer_2"),
                            self.get_module("tokenizer_3")],
                postprocess_funcs=cfg.postprocess_text_funcs,
                max_lengths=getattr(cfg, "text_encoder_max_lengths", ()),
                encoder_kwargs=getattr(cfg, "text_encoder_extra_kwargs", ()),
            ))
        self.add_stage("timestep_preparation_stage",
                       SD35TimestepPreparationStage(
                           self.get_module("scheduler"), cfg))
        self.add_stage("latent_preparation_stage",
                       SD35LatentPreparationStage(
                           self.get_module("scheduler"),
                           vae_config=cfg.vae_config,
                           dit_config=cfg.dit_config))
        self.add_stage("conditioning_stage", SD35ConditioningStage())
        self.add_stage("denoising_stage",
                       SD35DenoisingStage(self.get_module("transformer"),
                                          self.get_module("scheduler"), cfg))
        self.add_stage("decoding_stage",
                       SD35DecodingStage(self.get_module("vae"), cfg))


class StableDiffusion3Pipeline(SD35Pipeline):
    """Alias matching SD3.5 diffusers model_index _class_name."""


EntryClass = [SD35Pipeline, StableDiffusion3Pipeline]
