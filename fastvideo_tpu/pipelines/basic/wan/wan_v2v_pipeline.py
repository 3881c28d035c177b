"""Wan video-to-video + Lucy Edit pipelines.

Behavioral reference: /root/reference/fastvideo/pipelines/basic/wan/
wan_v2v_pipeline.py (:24-72) and lucy_edit_pipeline.py (:26-81): the Wan
stage topology plus a VideoVAEEncodingStage that turns the source clip
into a channel-concat control latent. V2V optionally CLIP-encodes a
reference image and samples the control posterior; Lucy Edit (Wan2.2 5B)
uses the posterior mode and expanded per-token timesteps.
"""

from __future__ import annotations

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.pipelines.basic.wan.wan_pipeline import WanPipeline
from fastvideo_tpu.pipelines.stages.image_encoding import (
    ImageEncodingStage, VideoVAEEncodingStage)


class WanVideoToVideoPipeline(WanPipeline):
    _required_config_modules = [
        "text_encoder", "tokenizer", "vae", "transformer", "scheduler"
    ]

    _control_sample_mode = "sample"

    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        super().create_pipeline_stages(fastvideo_args)
        extra = []
        if self.get_module("image_encoder") is not None:
            # optional reference-image CLIP conditioning (reference
            # wan_v2v_pipeline.py:46-52)
            extra.append(("ref_image_encoding_stage",
                          ImageEncodingStage(
                              self.get_module("image_encoder"))))
        extra.append(("video_vae_encoding_stage",
                      VideoVAEEncodingStage(
                          self.get_module("vae"),
                          self.pipeline_config.vae_config,
                          sample_mode=self._control_sample_mode)))
        pos = self._stages.index(self.denoising_stage)
        self._stages[pos:pos] = [stage for _, stage in extra]
        for name, stage in extra:
            self._stage_name_mapping[name] = stage
            setattr(self, name, stage)


class LucyEditPipeline(WanVideoToVideoPipeline):
    """decart-ai/Lucy-Edit-Dev (reference lucy_edit_pipeline.py:26-81):
    no CLIP components; argmax control-latent encoding."""

    _control_sample_mode = "argmax"


EntryClass = WanVideoToVideoPipeline
