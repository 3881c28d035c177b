"""Image preprocessing for conditioning inputs.

Analog of /root/reference/fastvideo/image_processor.py (:12-224):
PIL / numpy / array inputs -> [-1, 1] float tensors resized to
VAE-scale-aligned dimensions (center-crop-to-ratio then bilinear resize).
"""

from __future__ import annotations

import numpy as np

from fastvideo_tpu.dataset.transform import center_crop_th_tw, resize


class ImageProcessor:
    def __init__(self, vae_scale_factor: int = 8):
        self.vae_scale_factor = vae_scale_factor

    @staticmethod
    def _to_array(image) -> np.ndarray:
        """PIL.Image | np.ndarray [H,W,3] uint8/float -> float32 [H,W,3]."""
        if hasattr(image, "convert"):  # PIL
            image = np.asarray(image.convert("RGB"))
        image = np.asarray(image)
        if image.ndim == 2:
            image = np.stack([image] * 3, axis=-1)
        if image.dtype == np.uint8:
            image = image.astype(np.float32) / 255.0
        return image.astype(np.float32)

    def get_default_height_width(self, image,
                                 height: int | None = None,
                                 width: int | None = None):
        arr = self._to_array(image)
        h = height or arr.shape[0]
        w = width or arr.shape[1]
        f = self.vae_scale_factor
        return h - h % f, w - w % f

    def preprocess(self, image, height: int | None = None,
                   width: int | None = None) -> np.ndarray:
        """-> [1, 3, H, W] float32 in [-1, 1], H/W multiples of the VAE
        scale factor."""
        arr = self._to_array(image)  # [H, W, 3] in [0, 1]
        h, w = self.get_default_height_width(arr, height, width)
        clip = arr.transpose(2, 0, 1)[None]  # [1, 3, H, W]
        clip = center_crop_th_tw(clip, h, w)
        clip = resize(clip, (h, w))
        return clip * 2.0 - 1.0

    def preprocess_video_frame(self, image, height: int | None = None,
                               width: int | None = None) -> np.ndarray:
        """-> [1, 3, 1, H, W] (single-frame video layout)."""
        return self.preprocess(image, height, width)[:, :, None]
