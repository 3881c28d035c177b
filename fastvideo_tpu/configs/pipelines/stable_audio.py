"""Stable Audio Open pipeline configs.

Behavioral reference: /root/reference/fastvideo/configs/pipelines/
stable_audio.py (SA-Open-1.0: 2,097,152-sample window @ 44.1 kHz stereo;
SA-small: 524,288-sample window).
"""

from __future__ import annotations

import dataclasses

from fastvideo_tpu.configs.models.dits.stable_audio import StableAudioConfig
from fastvideo_tpu.configs.pipelines.base import PipelineConfig


@dataclasses.dataclass
class StableAudioOpenConfig(PipelineConfig):
    dit_config: StableAudioConfig = dataclasses.field(
        default_factory=StableAudioConfig)

    num_inference_steps: int = 100
    guidance_scale: float = 7.0
    audio_start_in_s: float = 0.0
    audio_end_in_s: float = 10.0
    sampling_rate: int = 44100
    audio_channels: int = 2
    sample_size: int = 2097152
    # dpmpp-3m-sde sampler window (model card defaults)
    sigma_min: float = 0.3
    sigma_max: float = 500.0
    rho: float = 1.0


@dataclasses.dataclass
class StableAudioSmallConfig(StableAudioOpenConfig):
    sample_size: int = 524288
    audio_end_in_s: float = 6.0


from fastvideo_tpu.configs.sample import SamplingParam  # noqa: E402


@dataclasses.dataclass
class StableAudioSamplingParam(SamplingParam):
    """Audio-shaped defaults (geometry fields are video-API placeholders)."""

    data_type: str = "audio"
    height: int = 16
    width: int = 16
    num_frames: int = 1
    num_inference_steps: int = 100
    guidance_scale: float = 7.0
    negative_prompt: str = ""
    save_video: bool = False
