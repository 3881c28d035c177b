"""Preprocess pipeline: raw videos + captions -> latents/embeds parquet.

Analog of /root/reference/fastvideo/pipelines/preprocess/
preprocess_pipeline_base.py:25-235 + workflow/preprocess: batches of clips
are VAE-encoded and captions text-encoded, then written as parquet records
(the training dataset format).
"""

from __future__ import annotations

import os
from collections.abc import Iterable

import jax.numpy as jnp
import numpy as np

from fastvideo_tpu.dataset.parquet import (record_from_sample,
                                           write_parquet_dataset)
from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)


def load_video_frames(path: str, num_frames: int | None = None) -> np.ndarray:
    """Read a video file into [T, H, W, 3] uint8 via imageio/ffmpeg
    (.npy arrays pass straight through)."""
    if path.endswith(".npy"):
        frames = np.load(path)
        return frames[:num_frames] if num_frames else frames
    import imageio.v2 as imageio

    reader = imageio.get_reader(path)
    frames = []
    for i, frame in enumerate(reader):
        if num_frames is not None and i >= num_frames:
            break
        frames.append(frame)
    reader.close()
    return np.stack(frames)


class PreprocessPipeline:
    def __init__(self, vae, text_encoder, tokenizer, text_len: int = 512,
                 samples_per_file: int = 64):
        self.vae = vae
        self.text_encoder = text_encoder
        self.tokenizer = tokenizer
        self.text_len = text_len
        self.samples_per_file = samples_per_file

    def encode_video(self, frames: np.ndarray) -> np.ndarray:
        """[T, H, W, 3] uint8 -> normalized latents [C, T_lat, h, w]."""
        pixels = frames.astype(np.float32) / 127.5 - 1.0
        pixels = pixels.transpose(3, 0, 1, 2)[None]  # [1, 3, T, H, W]
        dist = self.vae.encode(jnp.asarray(pixels))
        latent = dist.mean.transpose(0, 4, 1, 2, 3)  # NCDHW
        latent = self.vae.normalize_latents(latent)
        return np.asarray(latent[0], dtype=np.float32)

    def encode_text(self, caption: str) -> np.ndarray:
        enc = self.tokenizer([caption], padding="max_length",
                             max_length=self.text_len, truncation=True,
                             return_tensors="np")
        out = self.text_encoder(jnp.asarray(enc["input_ids"]),
                                jnp.asarray(enc["attention_mask"]))
        hidden = out.last_hidden_state * (
            jnp.asarray(enc["attention_mask"])[..., None] > 0)
        return np.asarray(hidden[0], dtype=np.float32)

    def run(self, samples: Iterable[dict], output_dir: str,
            fps: float = 16.0) -> int:
        """samples: iterable of {"id", "frames" | "video_path", "caption"}."""
        os.makedirs(output_dir, exist_ok=True)
        records, total = [], 0
        for sample in samples:
            frames = sample.get("frames")
            if frames is None:
                frames = load_video_frames(sample["video_path"])
            latents = self.encode_video(frames)
            embeds = self.encode_text(sample.get("caption", ""))
            records.append(
                record_from_sample(
                    str(sample.get("id", total)), latents, embeds,
                    caption=sample.get("caption", ""),
                    width=frames.shape[2], height=frames.shape[1],
                    num_frames=frames.shape[0], fps=fps,
                    duration=frames.shape[0] / fps))
            total += 1
            if len(records) >= self.samples_per_file:
                write_parquet_dataset(records, output_dir,
                                      self.samples_per_file)
                records = []
        if records:
            write_parquet_dataset(records, output_dir,
                                  self.samples_per_file)
        logger.info("Preprocessed %d samples -> %s", total, output_dir)
        return total
