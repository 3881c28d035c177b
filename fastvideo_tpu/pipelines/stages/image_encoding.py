"""Image encoding stages for I2V.

Analog of /root/reference/fastvideo/pipelines/stages/image_encoding.py:
- ImageEncodingStage: PIL -> CLIP vision embeds (257 tokens).
- WanImageVAEEncodingStage (:430-500): first frame + zero padding -> VAE
  encode -> normalized latent condition; 4-channel first-frame mask
  prepended -> batch.image_latent [B, 20, T_lat, h, w].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import PIL.Image

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.stages.base import PipelineStage
from fastvideo_tpu.pipelines.stages.latent_preparation import (
    randn_like_reference)


def _load_pil(batch: ForwardBatch) -> PIL.Image.Image:
    if batch.pil_image is not None:
        return batch.pil_image
    if batch.image_path:
        return PIL.Image.open(batch.image_path)
    raise ValueError("I2V requires pil_image or image_path")


class ImageEncodingStage(PipelineStage):
    """CLIP image conditioning (reference image_encoding.py:39-80)."""

    def __init__(self, image_encoder, image_processor=None):
        self.image_encoder = image_encoder
        self.image_processor = image_processor

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if self.image_encoder is None:
            return batch
        from fastvideo_tpu.models.encoders.clip import preprocess_image

        image = _load_pil(batch)
        px = preprocess_image(image, self.image_encoder.config)
        out = self.image_encoder(jnp.asarray(px))
        batch.image_embeds.append(out.last_hidden_state)
        return batch


class WanImageVAEEncodingStage(PipelineStage):
    """First-frame VAE conditioning (reference image_encoding.py:430-500)."""

    def __init__(self, vae, vae_config=None):
        self.vae = vae
        self.vae_config = vae_config

    @staticmethod
    def _preprocess_pixels(image: PIL.Image.Image, height: int,
                           width: int) -> np.ndarray:
        img = image.convert("RGB").resize((width, height),
                                          PIL.Image.LANCZOS)
        arr = np.asarray(img, dtype=np.float32) / 127.5 - 1.0
        return arr.transpose(2, 0, 1)[None]  # [1, 3, H, W]

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if self.vae is None or self.vae.encoder is None:
            return batch
        image = _load_pil(batch)
        h, w, f = batch.height, batch.width, batch.num_frames
        arch = self.vae.config
        sr = arch.spatial_compression_ratio
        tr = arch.temporal_compression_ratio
        lat_h, lat_w = h // sr, w // sr
        lat_t = (f - 1) // tr + 1

        px = self._preprocess_pixels(image, h, w)
        video = np.concatenate(
            [px[:, :, None], np.zeros((1, 3, f - 1, h, w), np.float32)],
            axis=2)
        dist = self.vae.encode(jnp.asarray(video))
        # deterministic posterior sample with the reference's CPU-seeded noise
        noise = randn_like_reference(
            (1, *dist.mean.shape[1:]), batch.seeds or [batch.seed or 0])
        latent = dist.mean + dist.std * jnp.asarray(noise)
        latent = latent.transpose(0, 4, 1, 2, 3)  # NCDHW
        latent = self.vae.normalize_latents(latent)

        # 4-channel first-frame mask (reference :481-490)
        mask = np.ones((1, 1, f, lat_h, lat_w), np.float32)
        mask[:, :, 1:] = 0
        first = np.repeat(mask[:, :, 0:1], tr, axis=2)
        mask = np.concatenate([first, mask[:, :, 1:]], axis=2)
        mask = mask.reshape(1, lat_t, tr, lat_h, lat_w).transpose(
            0, 2, 1, 3, 4)
        batch.image_latent = jnp.concatenate(
            [jnp.asarray(mask), latent.astype(jnp.float32)], axis=1)
        return batch
