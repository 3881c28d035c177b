"""FVD — Fréchet Video Distance (set-vs-set metric).

Behavioral reference: /root/reference/fastvideo/eval/metrics/common/fvd/
metric.py (:87-145 Fréchet math, :54-104 I3D extractor). Extractors:

* ``i3d`` — the canonical Kinetics-400 feature space. Zero-egress gate:
  point ``$FASTVIDEO_I3D_WEIGHTS`` at a locally saved TorchScript I3D
  (the same artifact the reference downloads); it runs on torch CPU —
  eval feature extraction is not the TPU compute path.
* ``clip`` — our CLIP vision encoder over per-frame embeds, mean-pooled
  (gated on a local checkpoint dir via ``$FASTVIDEO_CLIP_WEIGHTS``).
* ``pixel`` — weight-free downsampled-pixel features. NOT comparable to
  literature FVD; exists so the distributional pipeline is testable and
  usable without any local weights (clearly labeled in results).
"""

from __future__ import annotations

import os
import warnings

import numpy as np

_MIN_VIDEOS_WARN = 256


def gaussian_params(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    features = np.atleast_2d(features)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    if sigma.ndim == 0:
        sigma = sigma.reshape(1, 1)
    return mu, sigma


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray,
                     sigma2: np.ndarray, eps: float = 1e-6) -> float:
    """(reference fvd/metric.py:103-127)."""
    import scipy.linalg

    sigma1 = sigma1 + eps * np.eye(sigma1.shape[0])
    sigma2 = sigma2 + eps * np.eye(sigma2.shape[0])
    diff = mu1 - mu2
    covmean = scipy.linalg.sqrtm(sigma1 @ sigma2)
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            warnings.warn("FVD: large imaginary component in sqrtm; "
                          "result may be inaccurate", stacklevel=2)
        covmean = covmean.real
    return float(np.sum(diff**2) +
                 np.trace(sigma1 + sigma2 - 2.0 * covmean))


class PixelExtractor:
    """Weight-free: bilinear-downsampled pixels as features."""

    name = "pixel"

    def __init__(self, frames: int = 4, size: int = 16):
        self.frames = frames
        self.size = size

    def __call__(self, video: np.ndarray) -> np.ndarray:
        """video [T, H, W, 3] in [0, 1] -> feature [D]."""
        import jax
        import jax.numpy as jnp

        t = np.linspace(0, len(video) - 1, self.frames).astype(int)
        x = jnp.asarray(video[t], jnp.float32)
        x = jax.image.resize(x, (self.frames, self.size, self.size, 3),
                             "bilinear")
        return np.asarray(x).reshape(-1)


class ClipExtractor:
    """Per-frame CLIP vision embeds, mean-pooled over time
    (reference _CLIPExtractor)."""

    name = "clip"

    def __init__(self, checkpoint: str | None = None):
        checkpoint = checkpoint or os.getenv("FASTVIDEO_CLIP_WEIGHTS", "")
        if not checkpoint or not os.path.exists(checkpoint):
            raise FileNotFoundError(
                "clip extractor needs a local CLIP vision checkpoint dir; "
                "set FASTVIDEO_CLIP_WEIGHTS")
        from fastvideo_tpu.models.loader.component_loader import (
            load_model_component)

        self.model = load_model_component(checkpoint)

    def __call__(self, video: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        from fastvideo_tpu.models.encoders.clip import preprocess_image
        import PIL.Image

        embeds = []
        idx = np.linspace(0, len(video) - 1, min(len(video), 8)).astype(int)
        for i in idx:
            img = PIL.Image.fromarray(
                (np.clip(video[i], 0, 1) * 255).astype(np.uint8))
            px = preprocess_image(img, self.model.config)
            out = self.model(jnp.asarray(px))
            pooled = getattr(out, "pooler_output", None)
            if pooled is None:
                pooled = out.last_hidden_state.mean(axis=1)
            embeds.append(np.asarray(pooled)[0])
        return np.mean(embeds, axis=0)


class I3DExtractor:
    """Canonical Kinetics-400 I3D features via a LOCAL TorchScript file
    (reference fvd/extractors.py:54-104; torch CPU execution)."""

    name = "i3d"
    MIN_FRAMES = 9

    def __init__(self, path: str | None = None):
        path = path or os.getenv("FASTVIDEO_I3D_WEIGHTS", "")
        if not path or not os.path.exists(path):
            raise FileNotFoundError(
                "i3d extractor needs a local TorchScript checkpoint; set "
                "FASTVIDEO_I3D_WEIGHTS (the reference's i3d_torchscript.pt)")
        import torch

        self.model = torch.jit.load(path, map_location="cpu").eval()

    def __call__(self, video: np.ndarray) -> np.ndarray:
        import torch
        import torch.nn.functional as F

        t, h, w, _ = video.shape
        if t < self.MIN_FRAMES:
            raise ValueError(f"I3D requires >= {self.MIN_FRAMES} frames")
        x = torch.from_numpy(np.asarray(video, np.float32)) * 2.0 - 1.0
        x = x.permute(0, 3, 1, 2)  # [T, 3, H, W]
        if (h, w) != (224, 224):
            x = F.interpolate(x, size=(224, 224), mode="bilinear",
                              align_corners=False)
        batch = x.permute(1, 0, 2, 3)[None]  # [1, 3, T, 224, 224]
        with torch.no_grad():
            feats = self.model(batch, rescale=False, resize=False,
                               return_features=True)
        return feats.reshape(-1).numpy()


_EXTRACTORS = {"pixel": PixelExtractor, "clip": ClipExtractor,
               "i3d": I3DExtractor}


def available_extractors() -> list[str]:
    return sorted(_EXTRACTORS)


class FVD:
    """Accumulate per-video features, finalize to the Fréchet distance
    (set-vs-set protocol, reference fvd/metric.py:145-296)."""

    def __init__(self, extractor: str = "pixel", **kwargs):
        self.extractor = _EXTRACTORS[extractor](**kwargs)
        self.extractor_name = extractor
        self.reset()

    def reset(self) -> None:
        self._gen: list[np.ndarray] = []
        self._ref: list[np.ndarray] = []

    def accumulate(self, video: np.ndarray, role: str = "generated") -> None:
        feats = self.extractor(video)
        (self._ref if role == "reference" else self._gen).append(feats)

    def finalize(self) -> dict[str, float]:
        if not self._gen or not self._ref:
            raise ValueError("FVD needs both generated and reference videos")
        n = min(len(self._gen), len(self._ref))
        if n < _MIN_VIDEOS_WARN:
            warnings.warn(
                f"FVD over {n} videos; >= {_MIN_VIDEOS_WARN} recommended "
                "for stable estimates", stacklevel=2)
        mu_g, s_g = gaussian_params(np.stack(self._gen))
        mu_r, s_r = gaussian_params(np.stack(self._ref))
        return {
            "fvd": frechet_distance(mu_g, s_g, mu_r, s_r),
            "extractor": self.extractor_name,
            "n_generated": len(self._gen),
            "n_reference": len(self._ref),
        }
