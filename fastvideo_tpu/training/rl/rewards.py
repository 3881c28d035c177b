"""Reward scorers for RL training methods.

Behavior analog of /root/reference/fastvideo/train/methods/rl/rewards/
(media.py MultiRewardScorer / select_first_frame; frame_rewards.py
PickScore + CLIPScore). Zero-egress policy: the CLIP-family scorers run
the repo's own JAX CLIP towers and load weights from LOCAL checkpoint
dirs (same gating pattern as eval/lpips.py) — tests and offline runs
inject synthetic scorers via ``build_multi_reward_scorer(scorers=...)``.
"""

from __future__ import annotations

import os
from typing import Callable, Mapping, Sequence

import numpy as np

# A reward scorer maps (media [B,C,T,H,W] or [B,C,H,W] in [0,1], prompts)
# -> per-sample float scores [B].
RewardScorer = Callable[[np.ndarray, Sequence[str]], np.ndarray]


def select_first_frame(media: np.ndarray) -> np.ndarray:
    """First-frame view as [B, C, H, W] (reference media.py:13-27)."""
    media = np.asarray(media)
    if media.ndim == 5:
        return media[:, :, 0]
    if media.ndim == 4:
        return media
    raise ValueError("media must have shape [B, C, H, W] or [B, C, T, H, W],"
                     f" got {media.shape}")


class MultiRewardScorer:
    """Weighted sum of named scorers (reference media.py:30-75)."""

    def __init__(self, reward_weights: Mapping[str, float], *,
                 scorers: Mapping[str, RewardScorer]):
        self.reward_weights = {
            str(k): float(v)
            for k, v in reward_weights.items()
        }
        if not self.reward_weights:
            raise ValueError("reward_weights must contain at least one reward")
        self.scorers = dict(scorers)
        unsupported = sorted(set(self.reward_weights) - set(self.scorers))
        if unsupported:
            raise ValueError(f"Unsupported reward(s): {unsupported}. "
                             f"Available rewards: {sorted(self.scorers)}")

    def __call__(self, media: np.ndarray,
                 prompts: Sequence[str]) -> dict[str, np.ndarray]:
        n = len(prompts)
        if np.asarray(media).shape[0] != n:
            raise ValueError(f"media batch size ({media.shape[0]}) must "
                             f"match prompt count ({n})")
        total = None
        details: dict[str, np.ndarray] = {}
        for name, weight in self.reward_weights.items():
            scores = np.asarray(self.scorers[name](media, prompts),
                                np.float32)
            if scores.ndim != 1 or scores.shape[0] != n:
                raise ValueError(
                    f"Reward {name!r} must return shape [{n}], got "
                    f"{scores.shape}")
            details[name] = scores
            weighted = scores * weight
            total = weighted if total is None else total + weighted
        details["avg"] = total
        return details


class _ClipDualTowerScorer:
    """Text+vision CLIP similarity scorer over the repo's JAX CLIP stacks.

    Loads from a local diffusers/transformers-style dir with ``text``
    and ``vision`` component subdirs (converted CLIPModel weights)."""

    env_var = ""
    scale = 1.0

    def __init__(self, checkpoint: str | None = None):
        checkpoint = checkpoint or os.getenv(self.env_var, "")
        if not checkpoint or not os.path.exists(checkpoint):
            raise FileNotFoundError(
                f"{type(self).__name__} needs a local CLIP checkpoint dir "
                f"(text/ + vision/ components); set {self.env_var}")
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

    def _embed_text(self, prompts: Sequence[str]) -> np.ndarray:
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

    def _embed_frames(self, frames: np.ndarray) -> np.ndarray:
        import PIL.Image
        import jax.numpy as jnp

        from fastvideo_tpu.models.encoders.clip import preprocess_image

        embs = []
        for frame in frames:  # [C,H,W] in [0,1]
            img = PIL.Image.fromarray(
                (np.clip(frame.transpose(1, 2, 0), 0, 1) * 255).astype(
                    np.uint8))
            px = preprocess_image(img, self.vision.config)
            out = self.vision(jnp.asarray(px))
            pooled = getattr(out, "pooler_output", None)
            if pooled is None:
                pooled = out.last_hidden_state.mean(axis=1)
            embs.append(np.asarray(pooled)[0])
        emb = np.stack(embs)
        return emb / np.linalg.norm(emb, axis=-1, keepdims=True)

    def __call__(self, media: np.ndarray,
                 prompts: Sequence[str]) -> np.ndarray:
        frames = select_first_frame(np.asarray(media, np.float32))
        te = self._embed_text(prompts)
        fe = self._embed_frames(frames)
        return np.sum(te * fe, axis=-1).astype(np.float32) * self.scale


class ClipScoreScorer(_ClipDualTowerScorer):
    """CLIPScore reward (reference frame_rewards.py:81-130; /100 with the
    CLIP logit scale ~100 folds to raw cosine similarity here)."""

    env_var = "FASTVIDEO_CLIPSCORE_WEIGHTS"
    scale = 1.0


class PickScoreScorer(_ClipDualTowerScorer):
    """PickScore reward (reference frame_rewards.py:15-78; logit-scaled
    similarity / 26)."""

    env_var = "FASTVIDEO_PICKSCORE_WEIGHTS"
    scale = 100.0 / 26.0


def build_multi_reward_scorer(
        reward_weights: Mapping[str, float], *,
        scorers: Mapping[str, RewardScorer] | None = None
) -> MultiRewardScorer:
    """Reference rewards/__init__.py:15-27 with injectable scorers."""
    if not reward_weights:
        raise ValueError("reward_weights must contain at least one reward")
    available: dict[str, RewardScorer] = dict(scorers or {})
    if not available:
        available = {
            "pickscore": PickScoreScorer(),
            "clipscore": ClipScoreScorer(),
        }
    return MultiRewardScorer(reward_weights, scorers=available)
