"""GLM-Image pipeline config.

Behavioral reference: /root/reference/fastvideo/configs/pipelines/
glm_image.py (GlmImageConfig).
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.dits.glm_image import GlmImageDiTConfig
from fastvideo_tpu.configs.models.encoders.t5 import T5Config
from fastvideo_tpu.models.vaes.autoencoder_kl import AutoencoderKLConfig
from fastvideo_tpu.configs.pipelines.base import PipelineConfig
from fastvideo_tpu.configs.sample import SamplingParam


@dataclasses.dataclass
class GlmImagePipelineConfig(PipelineConfig):
    dit_config: GlmImageDiTConfig = dataclasses.field(
        default_factory=GlmImageDiTConfig)
    vae_config: AutoencoderKLConfig = dataclasses.field(
        default_factory=AutoencoderKLConfig)
    text_encoder_configs: tuple = dataclasses.field(
        default_factory=lambda: (T5Config(),))
    text_encoder_precisions: tuple = ("fp32",)
    flow_shift: float | None = 1.0


@dataclasses.dataclass
class GlmImageSamplingParam(SamplingParam):
    data_type: str = "image"
    num_frames: int = 1
    height: int = 1024
    width: int = 1024
    fps: int = 1
    num_inference_steps: int = 50
    guidance_scale: float = 1.5
    negative_prompt: str = ""
    save_video: bool = False
