"""HunyuanGameCraft camera/action-conditioned pipeline.

Analog of /root/reference/fastvideo/pipelines/basic/gamecraft/
gamecraft_pipeline.py (:25-100): HunyuanVideo text encoding + GameCraft
denoising (CameraNet Plücker conditioning, 33-channel concat input,
standard CFG) + Hunyuan VAE decode.
"""

from __future__ import annotations

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.pipelines.composed import ComposedPipelineBase
from fastvideo_tpu.pipelines.lora_pipeline import LoRAPipelineMixin
from fastvideo_tpu.pipelines.stages.decoding import DecodingStage
from fastvideo_tpu.pipelines.stages.gamecraft_denoising import (
    GameCraftDenoisingStage)
from fastvideo_tpu.pipelines.stages.input_validation import (
    InputValidationStage)
from fastvideo_tpu.pipelines.stages.latent_preparation import (
    LatentPreparationStage)
from fastvideo_tpu.pipelines.stages.text_encoding import TextEncodingStage
from fastvideo_tpu.pipelines.stages.timestep_preparation import (
    TimestepPreparationStage)


class HunyuanGameCraftPipeline(ComposedPipelineBase, LoRAPipelineMixin):
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
        self.add_stage("denoising_stage",
                       GameCraftDenoisingStage(self.get_module("transformer"),
                                               self.get_module("scheduler"),
                                               cfg))
        self.add_stage("decoding_stage",
                       DecodingStage(self.get_module("vae"), cfg))


EntryClass = HunyuanGameCraftPipeline
