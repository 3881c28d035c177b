"""SamplingParam: per-generation parameters.

Analog of /root/reference/fastvideo/api/sampling_param.py:18-256 — field
names preserved for drop-in compatibility; per-model presets resolved via
the registry in ``SamplingParam.from_pretrained``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

DEFAULT_NEGATIVE_PROMPT = (
    "Bright tones, overexposed, static, blurred details, subtitles, style, "
    "works, paintings, images, static, overall gray, worst quality, low "
    "quality, JPEG compression residue, ugly, incomplete, extra fingers, "
    "poorly drawn hands, poorly drawn faces, deformed, disfigured, "
    "misshapen limbs, fused fingers, still picture, messy background, "
    "three legs, many people in the background, walking backwards")


@dataclasses.dataclass
class SamplingParam:
    data_type: str = "video"

    # image / video inputs
    image_path: str | None = None
    pil_image: Any | None = None
    video_path: str | None = None
    latents: Any | None = None

    # text inputs
    prompt: str | list[str] | None = None
    negative_prompt: str = DEFAULT_NEGATIVE_PROMPT
    prompt_path: str | None = None
    output_path: str = "outputs/"
    output_video_name: str | None = None

    # batch info
    num_videos_per_prompt: int = 1
    seed: int = 1024

    # geometry
    num_frames: int = 81
    height: int = 480
    width: int = 832
    fps: int = 16

    # denoising
    num_inference_steps: int = 50
    guidance_scale: float = 5.0
    guidance_rescale: float = 0.0
    boundary_ratio: float | None = None

    # distilled sampling
    dmd_denoising_steps: list[int] | None = None

    # two-pass super-resolution (hy1.5 SR)
    height_sr: int | None = None
    width_sr: int | None = None
    num_inference_steps_sr: int | None = None

    # output
    return_frames: bool = False
    save_video: bool = True
    return_trajectory_latents: bool = False

    # free-form extras (model-family specific)
    extra: dict[str, Any] = dataclasses.field(default_factory=dict)

    def update(self, kwargs: dict[str, Any]) -> "SamplingParam":
        field_names = {f.name for f in dataclasses.fields(self)}
        for k, v in kwargs.items():
            if v is None:
                continue
            if k in field_names:
                setattr(self, k, v)
            else:
                self.extra[k] = v
        return self

    @classmethod
    def from_pretrained(cls, model_path: str) -> "SamplingParam":
        from fastvideo_tpu.registry import get_sampling_param_cls_for_name

        param_cls = get_sampling_param_cls_for_name(model_path) or cls
        return param_cls()
