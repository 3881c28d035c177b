"""Shared CLIP dual-tower (text + vision) scoring helper.

One local checkpoint dir with ``text/``, ``vision/`` and ``tokenizer/``
component subdirs (converted CLIPModel weights) serves every CLIP-based
scorer in the repo: the RL reward models
(training/rl/rewards.py) and the semantic VBench dimensions
(eval/suite/vbench_semantic.py). Zero-egress gating follows the
eval/lpips.py pattern: a clear error naming the env var when weights
are absent.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


class ClipDualTower:
    """Text+vision CLIP embedding over the repo's JAX CLIP stacks."""

    def __init__(self, checkpoint: str, env_var: str = ""):
        if not checkpoint or not os.path.exists(checkpoint):
            raise FileNotFoundError(
                "CLIP dual-tower scorer needs a local checkpoint dir "
                "(text/ + vision/ + tokenizer/ components)"
                + (f"; set {env_var}" if env_var else ""))
        from fastvideo_tpu.models.loader.component_loader import (
            load_model_component)

        self.text = load_model_component(os.path.join(checkpoint, "text"))
        self.vision = load_model_component(os.path.join(checkpoint,
                                                        "vision"))
        self.tokenizer = None
        tok_dir = os.path.join(checkpoint, "tokenizer")
        if os.path.exists(tok_dir):
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(tok_dir)

    @classmethod
    def from_env(cls, env_var: str) -> "ClipDualTower":
        return cls(os.getenv(env_var, ""), env_var=env_var)

    def embed_text(self, prompts: Sequence[str]) -> np.ndarray:
        """[N] prompts -> [N, D] L2-normalized embeddings."""
        import jax.numpy as jnp

        if self.tokenizer is None:
            raise RuntimeError("scorer checkpoint has no tokenizer/ dir")
        toks = self.tokenizer(list(prompts), padding="max_length",
                              truncation=True, max_length=77,
                              return_tensors="np")
        out = self.text(jnp.asarray(toks["input_ids"]))
        emb = np.asarray(getattr(out, "pooler_output",
                                 out.last_hidden_state[:, -1]))
        return emb / np.linalg.norm(emb, axis=-1, keepdims=True)

    def embed_frames_chw(self, frames: np.ndarray) -> np.ndarray:
        """[T, C, H, W] float [0,1] -> [T, D] L2-normalized embeddings."""
        return self.embed_frames_hwc(
            np.asarray(frames, np.float32).transpose(0, 2, 3, 1))

    def embed_frames_hwc(self, frames: np.ndarray) -> np.ndarray:
        """[T, H, W, C] float [0,1] -> [T, D] L2-normalized embeddings."""
        import PIL.Image
        import jax.numpy as jnp

        from fastvideo_tpu.models.encoders.clip import preprocess_image

        embs = []
        for frame in frames:
            img = PIL.Image.fromarray(
                (np.clip(frame, 0, 1) * 255).astype(np.uint8))
            px = preprocess_image(img, self.vision.config)
            out = self.vision(jnp.asarray(px))
            pooled = getattr(out, "pooler_output", None)
            if pooled is None:
                pooled = out.last_hidden_state.mean(axis=1)
            embs.append(np.asarray(pooled)[0])
        emb = np.stack(embs)
        return emb / np.linalg.norm(emb, axis=-1, keepdims=True)
