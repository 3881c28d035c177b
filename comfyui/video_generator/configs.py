"""Config-producing ComfyUI nodes.

Behavior analog of /root/reference/comfyui/video_generator/
{inference_args,vae_config,text_encoder_config,dit_config}.py: each
node collects optional overrides into a dict consumed by the
VideoGenerator node; unset sentinel values (-99999 / empty strings) are
dropped so downstream configs only see deliberate choices.
"""

from __future__ import annotations

from typing import Any

_UNSET_INT = -99999


def _filter_unset(raw: dict[str, Any]) -> dict[str, Any]:
    out = {}
    for k, v in raw.items():
        if v is None:
            continue
        if isinstance(v, (int, float)) and int(v) == _UNSET_INT:
            continue
        if isinstance(v, str) and not v.strip():
            continue
        out[k] = v
    return out


class InferenceArgs:
    """Sampling overrides (reference inference_args.py)."""

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "optional": {
                "height": ("INT", {"default": 720}),
                "width": ("INT", {"default": 1280}),
                "num_frames": ("INT", {"default": 45}),
                "num_inference_steps": ("INT", {"default": 6}),
                "guidance_scale": ("FLOAT", {"default": 1.0}),
                "flow_shift": ("INT", {"default": 17}),
                "seed": ("INT", {"default": 1024}),
                "fps": ("INT", {"default": 24}),
                "image_path": ("STRING", {"default": ""}),
            }
        }

    @classmethod
    def VALIDATE_INPUTS(cls, **kwargs):
        return True

    RETURN_TYPES = ("INFERENCE_ARGS",)
    RETURN_NAMES = ("inference_args",)
    FUNCTION = "set_args"
    CATEGORY = "fastvideo"

    def set_args(self, height=720, width=1280, num_frames=45,
                 num_inference_steps=6, guidance_scale=1.0, flow_shift=17,
                 seed=1024, fps=24, image_path=""):
        return (_filter_unset({
            "height": height, "width": width, "num_frames": num_frames,
            "num_inference_steps": num_inference_steps,
            "guidance_scale": guidance_scale, "flow_shift": flow_shift,
            "seed": seed, "fps": fps, "image_path": image_path}),)


class VAEConfig:
    """VAE tiling overrides (reference vae_config.py)."""

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "optional": {
                "load_encoder": ([True, False], {"default": True}),
                "load_decoder": ([True, False], {"default": True}),
                "tile_sample_min_height": ("INT", {"default": 256}),
                "tile_sample_min_width": ("INT", {"default": 256}),
                "tile_sample_min_num_frames": ("INT", {"default": 16}),
                "tile_sample_stride_height": ("INT", {"default": 192}),
                "tile_sample_stride_width": ("INT", {"default": 192}),
                "tile_sample_stride_num_frames": ("INT", {"default": 12}),
                "use_tiling": ([True, False], {"default": True}),
                "use_temporal_tiling": ([True, False], {"default": True}),
                "use_parallel_tiling": ([True, False], {"default": True}),
            }
        }

    @classmethod
    def VALIDATE_INPUTS(cls, **kwargs):
        return True

    RETURN_TYPES = ("VAE_CONFIG",)
    RETURN_NAMES = ("vae_config",)
    FUNCTION = "set_args"
    CATEGORY = "fastvideo"

    def set_args(self, **kwargs):
        return (_filter_unset(kwargs),)


class TextEncoderConfig:
    """Text-encoder overrides (reference text_encoder_config.py)."""

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "optional": {
                "prefix": ("STRING", {"default": ""}),
                "quant_config": ("STRING", {"default": ""}),
                "lora_config": ("STRING", {"default": ""}),
            }
        }

    @classmethod
    def VALIDATE_INPUTS(cls, **kwargs):
        return True

    RETURN_TYPES = ("TEXT_ENCODER_CONFIG",)
    RETURN_NAMES = ("text_encoder_config",)
    FUNCTION = "set_args"
    CATEGORY = "fastvideo"

    def set_args(self, prefix="", quant_config="", lora_config=""):
        return (_filter_unset({"prefix": prefix,
                               "quant_config": quant_config,
                               "lora_config": lora_config}),)


class DITConfig:
    """DiT overrides (reference dit_config.py)."""

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "optional": {
                "prefix": ("STRING", {"default": ""}),
                "quant_config": ("STRING", {"default": ""}),
            }
        }

    @classmethod
    def VALIDATE_INPUTS(cls, **kwargs):
        return True

    RETURN_TYPES = ("DIT_CONFIG",)
    RETURN_NAMES = ("dit_config",)
    FUNCTION = "set_args"
    CATEGORY = "fastvideo"

    def set_args(self, prefix="", quant_config=""):
        return (_filter_unset({"prefix": prefix,
                               "quant_config": quant_config}),)
