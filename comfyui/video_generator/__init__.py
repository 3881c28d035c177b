"""fastvideo_tpu ComfyUI nodes (reference comfyui/video_generator/nodes.py)."""

from comfyui.video_generator.configs import (DITConfig, InferenceArgs,
                                             TextEncoderConfig, VAEConfig)
from comfyui.video_generator.load_image import LoadImagePath
from comfyui.video_generator.video_generator import VideoGenerator

NODE_CLASS_MAPPINGS = {
    "VideoGenerator": VideoGenerator,
    "InferenceArgs": InferenceArgs,
    "VAEConfig": VAEConfig,
    "TextEncoderConfig": TextEncoderConfig,
    "DITConfig": DITConfig,
    "LoadImagePath": LoadImagePath,
}

NODE_DISPLAY_NAME_MAPPINGS = {
    "VideoGenerator": "Video Generator",
    "InferenceArgs": "Inference Args",
    "VAEConfig": "VAE Config",
    "TextEncoderConfig": "Text Encoder Config",
    "DITConfig": "DIT Config",
    "LoadImagePath": "Load Image Path",
}

__all__ = ["NODE_CLASS_MAPPINGS", "NODE_DISPLAY_NAME_MAPPINGS"]
