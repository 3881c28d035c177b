"""LoadImagePath node (reference comfyui/video_generator/load_image.py).

Returns the resolved path plus the decoded image (and alpha mask) as
numpy arrays in ComfyUI's [B, H, W, C] float [0,1] layout. The
``folder_paths`` ComfyUI API is used when available; outside ComfyUI
the node accepts absolute paths directly (testable without comfy).
"""

from __future__ import annotations

import os

import numpy as np


def _folder_paths():
    try:
        import folder_paths  # ComfyUI runtime module

        return folder_paths
    except ImportError:
        return None


class LoadImagePath:

    @classmethod
    def INPUT_TYPES(cls):
        fp = _folder_paths()
        if fp is not None:
            input_dir = fp.get_input_directory()
            files = sorted(f for f in os.listdir(input_dir)
                           if os.path.isfile(os.path.join(input_dir, f)))
            return {"required": {"image": (files, {"image_upload": True})}}
        return {"required": {"image": ("STRING", {"default": ""})}}

    CATEGORY = "fastvideo"
    RETURN_TYPES = ("STRING", "IMAGE", "MASK")
    RETURN_NAMES = ("image_path", "IMAGE", "MASK")
    FUNCTION = "load_image"

    def load_image(self, image: str):
        import PIL.Image
        import PIL.ImageOps

        fp = _folder_paths()
        path = (fp.get_annotated_filepath(image)
                if fp is not None else image)
        img = PIL.Image.open(path)
        img = PIL.ImageOps.exif_transpose(img)
        rgb = np.asarray(img.convert("RGB"), np.float32) / 255.0
        if "A" in img.getbands():
            alpha = np.asarray(img.getchannel("A"), np.float32) / 255.0
            mask = 1.0 - alpha
        else:
            mask = np.zeros(rgb.shape[:2], np.float32)
        return (path, rgb[None], mask[None])
