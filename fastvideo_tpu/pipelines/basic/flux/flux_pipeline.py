"""FLUX.1 text-to-image pipeline.

Analog of /root/reference/fastvideo/pipelines/basic/flux/flux_pipeline.py
(:19-74): CLIP pooled + T5 sequence, packed latents, embedded guidance.
"""

from __future__ import annotations

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.pipelines.composed import ComposedPipelineBase
from fastvideo_tpu.pipelines.stages.flux import (FluxConditioningStage,
                                                 FluxDecodingStage,
                                                 FluxDenoisingStage,
                                                 FluxLatentPreparationStage,
                                                 FluxTimestepPreparationStage)
from fastvideo_tpu.pipelines.stages.input_validation import (
    InputValidationStage)
from fastvideo_tpu.pipelines.stages.text_encoding import TextEncodingStage


class FluxPipeline(ComposedPipelineBase):
    _required_config_modules = [
        "scheduler", "transformer", "vae",
        "text_encoder", "text_encoder_2", "tokenizer", "tokenizer_2",
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
                               self.get_module("text_encoder_2")],
                tokenizers=[self.get_module("tokenizer"),
                            self.get_module("tokenizer_2")],
                postprocess_funcs=cfg.postprocess_text_funcs,
                max_lengths=getattr(cfg, "text_encoder_max_lengths", ()),
            ))
        self.add_stage("conditioning_stage", FluxConditioningStage())
        self.add_stage("timestep_preparation_stage",
                       FluxTimestepPreparationStage(
                           self.get_module("scheduler"), cfg))
        self.add_stage("latent_preparation_stage",
                       FluxLatentPreparationStage(
                           self.get_module("scheduler"),
                           vae_config=cfg.vae_config,
                           dit_config=cfg.dit_config))
        self.add_stage("denoising_stage",
                       FluxDenoisingStage(self.get_module("transformer"),
                                          self.get_module("scheduler"), cfg))
        self.add_stage("decoding_stage",
                       FluxDecodingStage(self.get_module("vae"), cfg))


EntryClass = FluxPipeline
