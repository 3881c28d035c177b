"""I2V preprocess: video + caption -> latents/embeds + first-frame
conditioning parquet.

Analog of /root/reference/fastvideo/pipelines/preprocess/
preprocess_pipeline_i2v.py: besides the T2V columns, each record carries
the CLIP vision feature of the first frame and the first-frame VAE latent
(what Wan-I2V concatenates into the DiT input).
"""

from __future__ import annotations

import os
from collections.abc import Iterable

import jax.numpy as jnp
import numpy as np

from fastvideo_tpu.dataset.parquet import (pyarrow_schema_i2v,
                                           record_from_i2v_sample,
                                           write_parquet_dataset)
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.pipelines.preprocess.preprocess_pipeline import (
    PreprocessPipeline, load_video_frames)

logger = init_logger(__name__)


class PreprocessPipelineI2V(PreprocessPipeline):
    """T2V preprocessing plus first-frame CLIP feature + VAE latent."""

    def __init__(self, vae, text_encoder, tokenizer, image_encoder=None,
                 text_len: int = 512, samples_per_file: int = 64):
        super().__init__(vae, text_encoder, tokenizer, text_len=text_len,
                         samples_per_file=samples_per_file)
        self.image_encoder = image_encoder

    def encode_first_frame_clip(self, frame: np.ndarray) -> np.ndarray:
        """[H, W, 3] uint8 -> CLIP penultimate feature [L, D] (zeros with
        no image encoder configured — the loader still gets the column)."""
        if self.image_encoder is None:
            return np.zeros((1, 1), np.float32)
        import PIL.Image

        from fastvideo_tpu.models.encoders.clip import preprocess_image

        pixels = preprocess_image(PIL.Image.fromarray(frame),
                                  self.image_encoder.config)
        out = self.image_encoder(jnp.asarray(pixels))
        return np.asarray(out.last_hidden_state[0], dtype=np.float32)

    def encode_first_frame_latent(self, frame: np.ndarray) -> np.ndarray:
        """[H, W, 3] uint8 -> [C, 1, h, w] normalized VAE latent."""
        one = frame[None]  # [1, H, W, 3]
        return self.encode_video(one)

    def run(self, samples: Iterable[dict], output_dir: str,
            fps: float = 16.0) -> int:
        os.makedirs(output_dir, exist_ok=True)
        records, total = [], 0
        for sample in samples:
            frames = sample.get("frames")
            if frames is None:
                frames = load_video_frames(sample["video_path"])
            latents = self.encode_video(frames)
            embeds = self.encode_text(sample.get("caption", ""))
            clip_feat = self.encode_first_frame_clip(frames[0])
            ff_latent = self.encode_first_frame_latent(frames[0])
            records.append(
                record_from_i2v_sample(
                    str(sample.get("id", total)), latents, embeds,
                    clip_feature=clip_feat, first_frame_latent=ff_latent,
                    caption=sample.get("caption", ""),
                    width=frames.shape[2], height=frames.shape[1],
                    num_frames=frames.shape[0], fps=fps,
                    duration=frames.shape[0] / fps))
            total += 1
            if len(records) >= self.samples_per_file:
                write_parquet_dataset(records, output_dir,
                                      self.samples_per_file,
                                      schema=pyarrow_schema_i2v())
                records = []
        if records:
            write_parquet_dataset(records, output_dir,
                                  self.samples_per_file,
                                  schema=pyarrow_schema_i2v())
        logger.info("Preprocessed %d i2v samples -> %s", total, output_dir)
        return total
