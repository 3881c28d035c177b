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


class Hy15ImageEncodingStage(PipelineStage):
    """HunyuanVideo-1.5 conditioning (reference image_encoding.py:140-280).

    Runs for BOTH tasks: the hy1.5 DiT's in_channels (65 = 32 latent +
    32 cond + 1 mask) always includes the condition block, so T2V gets a
    zero [z+1]-channel cond latent. I2V additionally encodes the image:
    SigLIP embeds -> ``batch.image_embeds`` and a first-frame VAE latent
    (posterior mode * scaling_factor) expanded over time with a frame-0
    mask channel appended -> ``batch.image_latent`` [B, z+1, T, h, w].
    """

    def __init__(self, image_encoder=None, vae=None, vae_config=None):
        self.image_encoder = image_encoder
        self.vae = vae
        self.vae_config = vae_config

    @staticmethod
    def _siglip_pixels(image, size: int) -> np.ndarray:
        if isinstance(image, np.ndarray):
            image = PIL.Image.fromarray(image)
        img = image.convert("RGB").resize((size, size), PIL.Image.LANCZOS)
        arr = np.asarray(img, dtype=np.float32) / 255.0
        arr = (arr - 0.5) / 0.5
        return arr.transpose(2, 0, 1)[None]  # [1, 3, S, S]

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        arch = self.vae_config or (self.vae.config if self.vae else None)
        assert arch is not None, "hy15 conditioning needs the VAE config"
        arch = getattr(arch, "arch_config", arch)
        sr = arch.spatial_compression_ratio
        tr = arch.temporal_compression_ratio
        zc = arch.z_dim
        lat_h, lat_w = batch.height // sr, batch.width // sr
        lat_t = (batch.num_frames - 1) // tr + 1

        is_t2v = batch.pil_image is None and not batch.image_path
        if is_t2v or self.vae is None or self.vae.encoder is None:
            # T2V: zero cond latent + mask; the DiT's static t2v branch
            # drops the (zero) image token stream entirely
            # (reference hunyuanvideo15.py:505-515 checks all-zeros).
            batch.image_latent = jnp.zeros((1, zc + 1, lat_t, lat_h, lat_w),
                                           jnp.float32)
            return batch

        image = _load_pil(batch)
        if self.image_encoder is not None:
            px = self._siglip_pixels(image,
                                     self.image_encoder.config.image_size)
            out = self.image_encoder(jnp.asarray(px))
            batch.image_embeds.append(out.last_hidden_state)

        # first-frame VAE latent: posterior mode (not a sample), scaled
        px = WanImageVAEEncodingStage._preprocess_pixels(
            image, batch.height, batch.width)[:, :, None]  # [1,3,1,H,W]
        cond = self.vae.encode(jnp.asarray(px)).mean
        cond = cond.transpose(0, 4, 1, 2, 3)  # NCDHW
        cond = self.vae.normalize_latents(cond)
        expanded = jnp.concatenate(
            [cond, jnp.zeros((1, zc, lat_t - 1, lat_h, lat_w), cond.dtype)],
            axis=2)
        mask = jnp.zeros((1, 1, lat_t, lat_h, lat_w), cond.dtype)
        mask = mask.at[:, :, 0].set(1.0)
        batch.image_latent = jnp.concatenate([expanded, mask], axis=1)
        return batch


class VideoVAEEncodingStage(PipelineStage):
    """Control-video VAE conditioning for V2V / Lucy Edit
    (reference image_encoding.py:573-700): load the source clip, resize
    to the generation geometry, truncate/zero-pad to num_frames, encode,
    normalize -> ``batch.video_latent`` [B, z, T_lat, h, w].

    ``sample_mode``: 'argmax' (posterior mode — Lucy Edit) or 'sample'
    (seeded posterior sample — V2V; reference :631-635).
    """

    def __init__(self, vae, vae_config=None, sample_mode: str = "sample"):
        if sample_mode not in ("argmax", "sample"):
            raise ValueError(f"unknown sample_mode {sample_mode!r}")
        self.vae = vae
        self.vae_config = vae_config
        self.sample_mode = sample_mode

    def _load_frames(self, batch: ForwardBatch) -> np.ndarray:
        """[T, H, W, 3] float32 in [0, 1]."""
        video = batch.extra.get("video")
        if video is not None:
            arr = np.asarray(video, np.float32)
            if arr.max() > 1.5:
                arr = arr / 255.0
            return arr
        if batch.video_path:
            from fastvideo_tpu.eval.pool import load_media

            frames = load_media(batch.video_path).frames
            if frames is None:
                raise ValueError(
                    f"no frames decoded from {batch.video_path}")
            return frames
        raise ValueError(
            "V2V requires extra['video'] frames or video_path")

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        frames = self._load_frames(batch)
        h, w, f = batch.height, batch.width, batch.num_frames
        frames = frames[:f]
        if frames.shape[1] != h or frames.shape[2] != w:
            import PIL.Image as _PIL

            resized = [
                np.asarray(
                    _PIL.Image.fromarray(
                        (np.clip(fr, 0, 1) * 255).astype(np.uint8)).resize(
                            (w, h), _PIL.Image.LANCZOS), np.float32) / 255.0
                for fr in frames
            ]
            frames = np.stack(resized)
        video = frames.transpose(3, 0, 1, 2)[None] * 2.0 - 1.0  # [1,3,T,H,W]
        if video.shape[2] < f:
            # zero-pad missing trailing frames (reference :695-700)
            pad = np.zeros((1, 3, f - video.shape[2], h, w), np.float32)
            video = np.concatenate([video, pad], axis=2)

        dist = self.vae.encode(jnp.asarray(video, jnp.float32))
        if self.sample_mode == "argmax":
            latent = dist.mode()
        else:
            noise = randn_like_reference(
                (1, *dist.mean.shape[1:]), batch.seeds or [batch.seed or 0])
            latent = dist.mean + dist.std * jnp.asarray(noise)
        latent = latent.transpose(0, 4, 1, 2, 3)  # NDHWC -> NCDHW
        batch.video_latent = self.vae.normalize_latents(latent).astype(
            jnp.float32)
        return batch


class WanImageVAEEncodingStage(PipelineStage):
    """First-frame VAE conditioning (reference image_encoding.py:430-500)."""

    def __init__(self, vae, vae_config=None):
        self.vae = vae
        self.vae_config = vae_config

    @staticmethod
    def _preprocess_pixels(image, height: int,
                           width: int) -> np.ndarray:
        if isinstance(image, np.ndarray):
            image = PIL.Image.fromarray(image)
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
