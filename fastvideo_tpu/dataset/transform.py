"""Video transforms for preprocessing.

Analog of /root/reference/fastvideo/dataset/transform.py (:17-160):
aspect-preserving center crop to a target ratio, bilinear resize,
255-normalize, and temporal random crop. NumPy/JAX host-side (transforms
feed the VAE encoder; the heavy compute stays on device).
"""

from __future__ import annotations

import random

import jax
import jax.numpy as jnp
import numpy as np

Array = np.ndarray


def crop(clip: Array, i: int, j: int, h: int, w: int) -> Array:
    """clip [T, C, H, W] -> spatial crop."""
    if clip.ndim != 4:
        raise ValueError("clip should be a 4D array [T, C, H, W]")
    return clip[..., i:i + h, j:j + w]


def resize(clip: Array, target_size: tuple[int, int]) -> Array:
    """Bilinear resize [T, C, H, W] -> [T, C, th, tw] (jax.image)."""
    if len(target_size) != 2:
        raise ValueError("target size should be (height, width)")
    t, c = clip.shape[:2]
    out = jax.image.resize(jnp.asarray(clip, jnp.float32),
                           (t, c, *target_size), method="bilinear")
    return np.asarray(out)


def center_crop_th_tw(clip: Array, th: int, tw: int,
                      top_crop: bool = False) -> Array:
    """Crop to the target aspect ratio th/tw, centered (or top-aligned)."""
    h, w = clip.shape[-2], clip.shape[-1]
    tr = th / tw
    if h / w > tr:
        new_h, new_w = int(w * tr), w
    else:
        new_h, new_w = h, int(h / tr)
    i = 0 if top_crop else int(round((h - new_h) / 2.0))
    j = int(round((w - new_w) / 2.0))
    return crop(clip, i, j, new_h, new_w)


def normalize_video(clip: Array) -> Array:
    """uint8 [0,255] -> float32 [0,1]."""
    return np.asarray(clip, np.float32) / 255.0


class CenterCropResizeVideo:
    """Aspect-ratio center crop then resize to (height, width)."""

    def __init__(self, size: tuple[int, int], top_crop: bool = False):
        if len(size) != 2:
            raise ValueError("size should be (height, width)")
        self.size = tuple(size)
        self.top_crop = top_crop

    def __call__(self, clip: Array) -> Array:
        cropped = center_crop_th_tw(clip, self.size[0], self.size[1],
                                    top_crop=self.top_crop)
        return resize(cropped, self.size)

    def __repr__(self) -> str:
        return f"{type(self).__name__}(size={self.size})"


class Normalize255:
    def __call__(self, clip: Array) -> Array:
        return normalize_video(clip)

    def __repr__(self) -> str:
        return type(self).__name__


class TemporalRandomCrop:
    """Pick a random [begin, end) window of `size` frames."""

    def __init__(self, size: int):
        self.size = size

    def __call__(self, total_frames: int) -> tuple[int, int]:
        rand_end = max(0, total_frames - self.size - 1)
        begin = random.randint(0, rand_end)
        return begin, min(begin + self.size, total_frames)


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, clip: Array) -> Array:
        for t in self.transforms:
            clip = t(clip)
        return clip
