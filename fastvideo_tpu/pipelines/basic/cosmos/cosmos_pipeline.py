"""Cosmos (Cosmos-Predict2) video pipeline.

Analog of /root/reference/fastvideo/pipelines/basic/cosmos/
cosmos_pipeline.py:20-66: T5 text encoding, Karras-sigma FlowMatchEuler
(sigma 0.002..80, sigma_data 1), EDM-preconditioned denoising, Wan VAE
decode (Cosmos-Predict2 ships the Wan VAE).
"""

from __future__ import annotations

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.models.schedulers.flow_match_euler import (
    FlowMatchEulerDiscreteScheduler)
from fastvideo_tpu.pipelines.composed import ComposedPipelineBase
from fastvideo_tpu.pipelines.stages.cosmos import (CosmosDenoisingStage,
                                                   CosmosLatentPreparationStage)
from fastvideo_tpu.pipelines.stages.decoding import DecodingStage
from fastvideo_tpu.pipelines.stages.input_validation import (
    InputValidationStage)
from fastvideo_tpu.pipelines.stages.text_encoding import TextEncodingStage
from fastvideo_tpu.pipelines.stages.timestep_preparation import (
    TimestepPreparationStage)


class Cosmos2VideoToWorldPipeline(ComposedPipelineBase):
    _required_config_modules = [
        "text_encoder", "tokenizer", "vae", "transformer", "scheduler"
    ]

    def initialize_pipeline(self, fastvideo_args: FastVideoArgs) -> None:
        sched = FlowMatchEulerDiscreteScheduler(
            shift=self.pipeline_config.flow_shift or 1.0,
            use_karras_sigmas=True, sigma_max=80.0, sigma_min=0.002,
            sigma_data=1.0, final_sigmas_type="sigma_min")
        self.modules["scheduler"] = sched

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
                       CosmosLatentPreparationStage(
                           self.get_module("scheduler"),
                           self.get_module("transformer"), cfg.vae_config))
        self.add_stage("denoising_stage",
                       CosmosDenoisingStage(self.get_module("transformer"),
                                            self.get_module("scheduler"),
                                            cfg))
        self.add_stage("decoding_stage",
                       DecodingStage(self.get_module("vae"), cfg))


EntryClass = Cosmos2VideoToWorldPipeline


class Cosmos2_5Pipeline(ComposedPipelineBase):
    """Cosmos-Predict2.5 T2W (reference pipelines/basic/cosmos/
    cosmos2_5_pipeline.py:14-44): Reason1 full-concat text encoding,
    Karras flow-match sigmas (shift 5), velocity-predicting DiT with the
    condition/padding-mask channels, Wan-style VAE decode."""

    _required_config_modules = [
        "text_encoder", "tokenizer", "vae", "transformer", "scheduler"
    ]

    def initialize_pipeline(self, fastvideo_args: FastVideoArgs) -> None:
        self.modules["scheduler"] = FlowMatchEulerDiscreteScheduler(
            shift=self.pipeline_config.flow_shift or 5.0,
            use_karras_sigmas=True)

    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        from fastvideo_tpu.pipelines.stages.cosmos import (
            Cosmos25DenoisingStage)
        from fastvideo_tpu.pipelines.stages.latent_preparation import (
            LatentPreparationStage)

        cfg = self.pipeline_config
        self.add_stage("input_validation_stage", InputValidationStage())
        self.add_stage(
            "prompt_encoding_stage",
            TextEncodingStage(
                text_encoders=[self.get_module("text_encoder")],
                tokenizers=[self.get_module("tokenizer")],
                postprocess_funcs=cfg.postprocess_text_funcs,
                encoder_kwargs=getattr(cfg, "text_encoder_extra_kwargs", ()),
            ))
        self.add_stage("timestep_preparation_stage",
                       TimestepPreparationStage(self.get_module("scheduler"),
                                                cfg))
        self.add_stage("latent_preparation_stage",
                       LatentPreparationStage(self.get_module("scheduler"),
                                              self.get_module("transformer"),
                                              cfg.vae_config))
        self.add_stage("denoising_stage",
                       Cosmos25DenoisingStage(self.get_module("transformer"),
                                              self.get_module("scheduler"),
                                              cfg))
        self.add_stage("decoding_stage",
                       DecodingStage(self.get_module("vae"), cfg))
