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
    """Text+vision CLIP similarity scorer (models/clip_scoring.py tower).

    Loads from a local diffusers/transformers-style dir with ``text``,
    ``vision`` and ``tokenizer`` component subdirs."""

    env_var = ""
    scale = 1.0

    def __init__(self, checkpoint: str | None = None):
        from fastvideo_tpu.models.clip_scoring import ClipDualTower

        self.tower = ClipDualTower(checkpoint or os.getenv(self.env_var, ""),
                                   env_var=self.env_var)

    def __call__(self, media: np.ndarray,
                 prompts: Sequence[str]) -> np.ndarray:
        frames = select_first_frame(np.asarray(media, np.float32))
        te = self.tower.embed_text(prompts)
        fe = self.tower.embed_frames_chw(frames)
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
        # construct ONLY the scorers the weights name: each eagerly loads
        # model weights (and errors when its weights env is unset)
        factories = {"pickscore": PickScoreScorer,
                     "clipscore": ClipScoreScorer}
        for name in reward_weights:
            if name not in factories:
                raise ValueError(f"unknown reward {name!r}; "
                                 f"available: {sorted(factories)}")
            available[name] = factories[name]()
    return MultiRewardScorer(reward_weights, scorers=available)
