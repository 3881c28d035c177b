"""DreamX-World pipeline configs.

Behavioral reference: /root/reference/fastvideo/configs/pipelines/
dreamx_world.py: the 5B-Cam mode is a Wan2.2-TI2V trunk (48-channel VAE,
expand_timesteps, flow_shift 3) with a PRoPE camera-conditioning adapter.
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.dits.dreamx_world import DreamXWorldConfig
from fastvideo_tpu.configs.pipelines.wan import WanT2V480PConfig
from fastvideo_tpu.configs.sample import SamplingParam

_NEGATIVE_PROMPT_CN = (
    "色调艳丽，过曝，静态，细节模糊不清，字幕，风格，作品，画作，画面，静止，整体发灰，最差质量，"
    "低质量，JPEG压缩残留，丑陋的，残缺的，多余的手指，画得不好的手部，画得不好的脸部，畸形的，"
    "毁容的，形态畸形的肢体，手指融合，静止不动的画面，杂乱的背景，三条腿，背景人很多，倒着走")


@dataclasses.dataclass
class DreamXWorld5BCamPipelineConfig(WanT2V480PConfig):
    dit_config: DreamXWorldConfig = dataclasses.field(
        default_factory=DreamXWorldConfig)
    flow_shift: float | None = 3.0
    ti2v_task: bool = True


@dataclasses.dataclass
class DreamXWorld5BARPipelineConfig(DreamXWorld5BCamPipelineConfig):
    """Autoregressive forcing (reference configs/pipelines/
    dreamx_world.py:112-128)."""

    dit_config: object = dataclasses.field(default_factory=lambda: _ar_dit())
    flow_shift: float | None = 5.0
    dmd_denoising_steps: list[int] | None = dataclasses.field(
        default_factory=lambda: [1000, 750, 500, 250])
    warp_denoising_step: bool = True
    context_noise: float = 0.1


def _ar_dit():
    from fastvideo_tpu.models.dits.dreamx_world_ar import (
        DreamXWorldARVideoConfig)

    return DreamXWorldARVideoConfig()


@dataclasses.dataclass
class DreamXWorldSamplingParam(SamplingParam):
    """Reference presets.py DREAMX_WORLD_5B_CAM defaults."""

    height: int = 480
    width: int = 832
    num_frames: int = 161
    fps: int = 16
    guidance_scale: float = 5.0
    num_inference_steps: int = 30
    negative_prompt: str = _NEGATIVE_PROMPT_CN
