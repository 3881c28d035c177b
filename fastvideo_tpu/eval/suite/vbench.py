"""VBench dimension metrics.

Behavioral reference: /root/reference/fastvideo/eval/metrics/vbench/
(temporal_flickering, dynamic_degree, motion_smoothness,
subject_consistency, background_consistency, aesthetic_quality +
_utils.consistency_score). Scoring formulas match the reference;
model backbones deviate where the original requires downloads:

* dynamic_degree: JAX pyramidal LK flow (eval/flow.py) instead of RAFT —
  same top-5% magnitude statistic, resolution-adaptive threshold and
  dynamic/static vote.
* motion_smoothness: flow-compensated midpoint warp instead of the AMT-S
  interpolation network — even frames are predicted from their neighbors
  by warping along half the estimated flow; score = (255 - MAE) / 255
  like the reference.
* subject/background consistency + aesthetic: our JAX CLIP vision tower,
  gated on $FASTVIDEO_CLIP_WEIGHTS (the reference downloads DINO/CLIP;
  zero egress here). The consistency formula is byte-identical.
"""

from __future__ import annotations

import os

import numpy as np

from fastvideo_tpu.eval.base import BaseMetric
from fastvideo_tpu.eval.registry import register
from fastvideo_tpu.eval.types import MetricResult


def consistency_score(features: np.ndarray) -> float:
    """(T, D) L2-normalized features → mean of
    (cos(f_t, f_{t-1}) + cos(f_t, f_0)) / 2, each clamped >= 0
    (reference vbench/_utils.py:9-31)."""
    t = features.shape[0]
    if t <= 1:
        return 1.0
    f = features / (np.linalg.norm(features, axis=-1, keepdims=True) + 1e-8)
    sim_prev = np.clip((f[1:] * f[:-1]).sum(-1), 0.0, None)
    sim_first = np.clip((f[1:] * f[:1]).sum(-1), 0.0, None)
    return float(((sim_prev + sim_first) / 2).mean())


@register("vbench.temporal_flickering")
class TemporalFlickeringMetric(BaseMetric):
    """score = (255 - mean consecutive-frame MAE in uint8 space) / 255."""

    requires_reference = False

    def compute(self, sample: dict) -> MetricResult:
        video = sample.get("video")
        if video is None:
            return self._skip("missing sample['video']")
        frames = np.clip(np.asarray(video, np.float32), 0, 1) * 255.0
        if frames.shape[0] <= 1:
            return MetricResult(name=self.name, score=1.0)
        mae = [float(np.mean(np.abs(frames[t] - frames[t + 1])))
               for t in range(frames.shape[0] - 1)]
        return MetricResult(name=self.name,
                            score=(255.0 - float(np.mean(mae))) / 255.0,
                            details={"per_pair_mae": mae})


@register("vbench.dynamic_degree")
class DynamicDegreeMetric(BaseMetric):
    """Binary dynamic/static from top-5%% flow magnitudes: threshold
    6 * (min(H,W)/256), dynamic when > round(4 * n/16) pairs exceed it
    (reference dynamic_degree/metric.py:62-135). Needs sample['fps'] for
    the 8 fps sampling stride."""

    requires_reference = False

    def compute(self, sample: dict) -> MetricResult:
        from fastvideo_tpu.eval.flow import extract_video_flows

        video = sample.get("video")
        if video is None:
            return self._skip("missing sample['video']")
        if "fps" not in sample or not sample["fps"]:
            return self._skip("missing 'fps' (sets the 8fps flow stride)")
        fps = float(sample["fps"])
        interval = max(1, round(fps / 8.0))
        frames = np.asarray(video)[::interval]
        n = frames.shape[0]
        if n < 2:
            return self._skip("need >=2 sampled frames")
        flows = extract_video_flows(frames)
        h, w = frames.shape[1:3]
        scores = []
        for fl in flows:
            rad = np.linalg.norm(fl, axis=-1).ravel()
            cut = max(1, int(rad.size * 0.05))
            scores.append(float(np.sort(rad)[-cut:].mean()))
        thres = 6.0 * (min(h, w) / 256.0)
        count_needed = round(4 * (n / 16.0))
        count_above = sum(1 for s in scores if s > thres)
        return MetricResult(
            name=self.name,
            score=1.0 if count_above >= count_needed else 0.0,
            details={"per_pair_magnitude": scores, "threshold": thres,
                     "count_above": count_above,
                     "count_needed": count_needed, "interval": interval})


@register("vbench.motion_smoothness")
class MotionSmoothnessMetric(BaseMetric):
    """Predict every odd frame by warping its predecessor along half the
    even-to-even flow; score = (255 - MAE(predicted, actual)) / 255."""

    requires_reference = False

    def compute(self, sample: dict) -> MetricResult:
        import jax
        import jax.numpy as jnp

        from fastvideo_tpu.eval.flow import (_warp_bilinear,
                                             extract_video_flows)

        video = sample.get("video")
        if video is None:
            return self._skip("missing sample['video']")
        frames = np.clip(np.asarray(video, np.float32), 0, 1)
        t = frames.shape[0]
        if t < 3:
            return MetricResult(name=self.name, score=1.0)
        evens = frames[::2]
        flows = extract_video_flows(evens)  # even_i -> even_{i+1}
        warp = jax.jit(jax.vmap(_warp_bilinear))
        diffs = []
        for i in range(len(flows)):
            mid_idx = 2 * i + 1
            if mid_idx >= t:
                break
            src = jnp.asarray(np.moveaxis(evens[i], -1, 0))  # [C, H, W]
            # backward warp toward the midpoint: with the LK convention
            # even_{i+1}(x + f) = even_i(x), the frame halfway along the
            # motion is predicted(x) = even_i(x - 0.5 f) — warping by
            # +0.5 f moves content AGAINST the motion
            half = jnp.asarray(-0.5 * flows[i])
            pred = np.moveaxis(
                np.asarray(warp(src, jnp.broadcast_to(
                    half, (src.shape[0], *half.shape)))), 0, -1)
            diffs.append(
                float(np.mean(np.abs(pred - frames[mid_idx])) * 255.0))
        if not diffs:
            return MetricResult(name=self.name, score=1.0)
        vfi = float(np.mean(diffs))
        return MetricResult(name=self.name, score=(255.0 - vfi) / 255.0,
                            details={"vfi_score": vfi})


class _ClipFrameFeatures:
    """Shared CLIP-vision frame featurizer (weights-gated)."""

    def __init__(self) -> None:
        self._model = None

    def setup(self) -> None:
        if self._model is not None:
            return
        path = os.environ.get("FASTVIDEO_CLIP_WEIGHTS", "")
        if not path or not os.path.exists(path):
            raise FileNotFoundError(
                "set FASTVIDEO_CLIP_WEIGHTS to a local CLIP vision "
                "checkpoint dir")
        from fastvideo_tpu.models.loader.component_loader import (
            load_model_component)

        self._model = load_model_component(path)

    def features(self, frames: np.ndarray,
                 max_frames: int = 16) -> np.ndarray:
        """[T, H, W, C] float [0,1] → (T', D) pooled embeddings."""
        import PIL.Image
        import jax.numpy as jnp

        from fastvideo_tpu.models.encoders.clip import preprocess_image

        self.setup()
        idx = np.linspace(0, len(frames) - 1,
                          min(len(frames), max_frames)).astype(int)
        out = []
        for i in idx:
            img = PIL.Image.fromarray(
                (np.clip(frames[i], 0, 1) * 255).astype(np.uint8))
            px = preprocess_image(img, self._model.config)
            enc = self._model(jnp.asarray(px))
            pooled = getattr(enc, "pooler_output", None)
            if pooled is None:
                pooled = enc.last_hidden_state.mean(axis=1)
            out.append(np.asarray(pooled, np.float32)[0])
        return np.stack(out)


@register("vbench.subject_consistency")
class SubjectConsistencyMetric(BaseMetric):
    """Temporal feature similarity (reference uses DINO ViT-B/16; here
    the CLIP vision tower under the same consistency formula)."""

    requires_reference = False
    weights_env = "FASTVIDEO_CLIP_WEIGHTS"

    def __init__(self) -> None:
        self._feat = _ClipFrameFeatures()

    def setup(self) -> None:
        self._feat.setup()

    def compute(self, sample: dict) -> MetricResult:
        video = sample.get("video")
        if video is None:
            return self._skip("missing sample['video']")
        feats = self._feat.features(np.asarray(video))
        return MetricResult(name=self.name,
                            score=consistency_score(feats))


@register("vbench.background_consistency")
class BackgroundConsistencyMetric(BaseMetric):
    """CLIP frame-feature temporal consistency
    (reference background_consistency/metric.py:67-84)."""

    requires_reference = False
    weights_env = "FASTVIDEO_CLIP_WEIGHTS"

    def __init__(self) -> None:
        self._feat = _ClipFrameFeatures()

    def setup(self) -> None:
        self._feat.setup()

    def compute(self, sample: dict) -> MetricResult:
        video = sample.get("video")
        if video is None:
            return self._skip("missing sample['video']")
        feats = self._feat.features(np.asarray(video))
        return MetricResult(name=self.name,
                            score=consistency_score(feats))


@register("vbench.aesthetic_quality")
class AestheticQualityMetric(BaseMetric):
    """LAION aesthetic predictor: a small MLP over CLIP image embeds,
    mean score / 10 (reference aesthetic_quality). Weights: an .npz of
    the MLP's linear layers at $FASTVIDEO_AESTHETIC_WEIGHTS (keys
    ``layers.{i}.weight|bias``) + the CLIP tower."""

    requires_reference = False
    weights_env = "FASTVIDEO_AESTHETIC_WEIGHTS"

    def __init__(self) -> None:
        self._feat = _ClipFrameFeatures()
        self._mlp = None

    def setup(self) -> None:
        self._feat.setup()
        if self._mlp is None:
            path = os.environ["FASTVIDEO_AESTHETIC_WEIGHTS"]
            self._mlp = dict(np.load(path))

    def _head(self, x: np.ndarray) -> np.ndarray:
        i = 0
        while f"layers.{i}.weight" in self._mlp:
            w = self._mlp[f"layers.{i}.weight"]
            b = self._mlp[f"layers.{i}.bias"]
            x = x @ w.T + b
            if f"layers.{i + 1}.weight" in self._mlp:
                x = np.maximum(x, 0.0)
            i += 1
        return x

    def compute(self, sample: dict) -> MetricResult:
        video = sample.get("video")
        if video is None:
            return self._skip("missing sample['video']")
        self.setup()
        feats = self._feat.features(np.asarray(video))
        feats = feats / (np.linalg.norm(feats, axis=-1, keepdims=True) +
                         1e-8)
        scores = self._head(feats).reshape(-1)
        return MetricResult(name=self.name,
                            score=float(np.clip(scores.mean() / 10.0, 0, 1)),
                            details={"raw_mean": float(scores.mean())})
