"""FLUX.2 text-to-image pipeline.

Analog of /root/reference/fastvideo/pipelines/basic/flux_2/
flux_2_pipeline.py (:29-96): single text encoder (Mistral3 full / Qwen3
Klein), packed 2x2 latents, empirical-mu flow sigmas, BN-denormalized
decode. The Klein variant differs only in config (encoder + guidance).
"""

from __future__ import annotations

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.pipelines.composed import ComposedPipelineBase
from fastvideo_tpu.pipelines.stages.flux2 import (
    Flux2DecodingStage, Flux2DenoisingStage, Flux2LatentPreparationStage,
    Flux2TimestepPreparationStage)
from fastvideo_tpu.pipelines.stages.input_validation import (
    InputValidationStage)
from fastvideo_tpu.pipelines.stages.text_encoding import TextEncodingStage


class Flux2Pipeline(ComposedPipelineBase):
    _required_config_modules = [
        "scheduler", "transformer", "vae", "text_encoder", "tokenizer",
    ]

    def initialize_pipeline(self, fastvideo_args: FastVideoArgs) -> None:
        from fastvideo_tpu.models.schedulers.flow_match_euler import (
            FlowMatchEulerDiscreteScheduler)

        sched = self.modules.get("scheduler")
        if sched is None or not getattr(sched, "use_dynamic_shifting",
                                        False):
            self.modules["scheduler"] = FlowMatchEulerDiscreteScheduler(
                shift=1.0, use_dynamic_shifting=True)

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
                max_lengths=getattr(cfg, "text_encoder_max_lengths", ()),
                encoder_kwargs=getattr(cfg, "text_encoder_extra_kwargs", ()),
            ))
        self.add_stage("timestep_preparation_stage",
                       Flux2TimestepPreparationStage(
                           self.get_module("scheduler"), cfg))
        self.add_stage("latent_preparation_stage",
                       Flux2LatentPreparationStage(
                           self.get_module("scheduler"),
                           vae_config=cfg.vae_config,
                           dit_config=cfg.dit_config))
        self.add_stage("denoising_stage",
                       Flux2DenoisingStage(self.get_module("transformer"),
                                           self.get_module("scheduler"),
                                           cfg))
        self.add_stage("decoding_stage",
                       Flux2DecodingStage(self.get_module("vae"), cfg))


EntryClass = Flux2Pipeline
