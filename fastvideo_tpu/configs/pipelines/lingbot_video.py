"""LingBot-Video pipeline config.

Behavioral reference: /root/reference/fastvideo/configs/pipelines/
lingbot_video.py: Wan VAE latents, Qwen3-VL text conditioning through a
chat template whose prefix is cropped at token 140, flow shift 3, fp32
scheduler state.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.dits.lingbot_video import (
    LingBotVideoConfig)
from fastvideo_tpu.configs.pipelines.base import PipelineConfig
from fastvideo_tpu.configs.sample import SamplingParam
from fastvideo_tpu.models.encoders.lingbot_video import (
    LingBotVideoQwen3VLTextConfig)

PROMPT_CROP_START = 140

PROMPT_TEMPLATE = (
    "<|im_start|>system\nYou are a helpful assistant that converts user "
    "inputs into rich, detailed visual descriptions suitable for video "
    "generation. Evaluate the level of detail in the user's input: if it "
    "is simple, enrich it by adding specifics about colors, shapes, sizes, "
    "textures, lighting, motion dynamics, camera movement, temporal "
    "progression, and spatial relationships to create vivid, concrete, and "
    "temporally coherent scenes to create vivid and concrete scenes. "
    "Please generate only the enhanced description for the prompt below "
    "and avoid including any additional commentary or evaluations:"
    "<|im_end|>\n<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n")


def preprocess_lingbot_video_prompt(prompt: str) -> str:
    return PROMPT_TEMPLATE.format(prompt)


def _wan_vae_config():
    from fastvideo_tpu.configs.pipelines.wan import WanVAEConfig

    return WanVAEConfig()


@dataclasses.dataclass
class LingBotVideoT2VConfig(PipelineConfig):
    dit_config: LingBotVideoConfig = dataclasses.field(
        default_factory=LingBotVideoConfig)
    vae_config: "WanVAEConfig" = dataclasses.field(
        default_factory=lambda: _wan_vae_config())
    text_encoder_configs: tuple = dataclasses.field(
        default_factory=lambda: (LingBotVideoQwen3VLTextConfig(),))
    text_encoder_precisions: tuple = ("bf16",)
    precision: str = "bf16"
    vae_precision: str = "fp32"
    flow_shift: float | None = 3.0
    # chat-template prefix length to crop from the conditioning stream
    prompt_crop_start: int = PROMPT_CROP_START


@dataclasses.dataclass
class LingBotVideoSamplingParam(SamplingParam):
    """Reference presets.py lingbot defaults."""

    height: int = 480
    width: int = 832
    num_frames: int = 121
    fps: int = 24
    num_inference_steps: int = 40
    guidance_scale: float = 3.0
    negative_prompt: str = ""
