"""LPIPS perceptual metric (AlexNet backbone), JAX implementation.

Behavioral reference: /root/reference/fastvideo/eval/metrics/common/lpips/
metric.py (which wraps the ``lpips`` pip package). Zero-egress port: the
AlexNet features + per-layer linear heads run in JAX; weights load from a
LOCAL ``lpips`` state dict (``LPIPS(net='alex').state_dict()`` saved with
``torch.save``) pointed at by ``$FASTVIDEO_LPIPS_WEIGHTS``. Without local
weights the metric raises a clear gating error (same policy as the
reference's dependency gate).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# torchvision AlexNet features: (out_ch, kernel, stride, pad); maxpool 3/2
# between stages 1-2, 2-3.
_ALEX_STAGES = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool after stages 0 and 1 (pre-activation of next)

# lpips-lib scaling layer constants (ScalingLayer shift/scale buffers)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def load_lpips_weights(path: str | None = None) -> dict[str, np.ndarray]:
    """Load an ``lpips`` state dict saved locally (torch format)."""
    path = path or os.getenv("FASTVIDEO_LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "LPIPS needs local weights: save "
            "`torch.save(lpips.LPIPS(net='alex').state_dict(), p)` on a "
            "machine with network access and set FASTVIDEO_LPIPS_WEIGHTS=p")
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def random_lpips_weights(seed: int = 0) -> dict[str, np.ndarray]:
    """Random weights in the lpips-lib key layout (structure tests)."""
    rng = np.random.default_rng(seed)
    out: dict[str, np.ndarray] = {}
    in_ch = 3
    for i, (out_ch, k, _, _) in enumerate(_ALEX_STAGES):
        # lpips keys: net.slice{n}.{conv_idx}.weight — conv indices in
        # torchvision AlexNet features: 0, 3, 6, 8, 10
        conv_idx = [0, 3, 6, 8, 10][i]
        out[f"net.slice{i + 1}.{conv_idx}.weight"] = rng.standard_normal(
            (out_ch, in_ch, k, k)).astype(np.float32) * 0.05
        out[f"net.slice{i + 1}.{conv_idx}.bias"] = np.zeros(out_ch,
                                                           np.float32)
        out[f"lin{i}.model.1.weight"] = np.abs(
            rng.standard_normal((1, out_ch, 1, 1))).astype(np.float32)
        in_ch = out_ch
    return out


def _conv(x: Array, w: np.ndarray, b: np.ndarray, stride: int,
          pad: int) -> Array:
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(w).transpose(2, 3, 1, 0),
        window_strides=(stride, stride), padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + jnp.asarray(b)


def _maxpool(x: Array) -> Array:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1), "VALID")


def _unit_normalize(x: Array) -> Array:
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + 1e-10)


@functools.partial(jax.jit, static_argnames=("wkey",))
def _lpips_jit(a, b, flat_weights, wkey):
    del wkey  # cache key for the (hashable) weight id
    weights = flat_weights

    def features(x):
        # x: [N, H, W, 3] in [-1, 1]
        x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
        feats = []
        for i, (_, k, s, p) in enumerate(_ALEX_STAGES):
            conv_idx = [0, 3, 6, 8, 10][i]
            w = weights[f"net.slice{i + 1}.{conv_idx}.weight"]
            bias = weights[f"net.slice{i + 1}.{conv_idx}.bias"]
            x = jax.nn.relu(_conv(x, w, bias, s, p))
            feats.append(x)
            if i in _POOL_AFTER:
                x = _maxpool(x)
        return feats

    fa, fb = features(a), features(b)
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        d = jnp.square(_unit_normalize(xa) - _unit_normalize(xb))
        lin = jnp.asarray(weights[f"lin{i}.model.1.weight"])[:, :, 0,
                                                            0].T  # [C,1]
        total = total + jnp.mean(jnp.einsum("nhwc,co->nhwo", d, lin),
                                 axis=(1, 2, 3))
    return total


class LPIPS:
    """Callable LPIPS(a, b) over [T, H, W, 3] videos in [0, 1]."""

    def __init__(self, weights: dict[str, np.ndarray] | None = None):
        self.weights = weights if weights is not None else \
            load_lpips_weights()
        self._jax_weights = {
            k: jnp.asarray(v)
            for k, v in self.weights.items()
            if k.startswith("net.") or k.startswith("lin")
        }

    def __call__(self, a: np.ndarray, b: np.ndarray,
                 chunk: int = 8) -> float:
        a = np.asarray(a, np.float32) * 2.0 - 1.0
        b = np.asarray(b, np.float32) * 2.0 - 1.0
        n = min(len(a), len(b))
        scores = []
        for i in range(0, n, chunk):
            s = _lpips_jit(jnp.asarray(a[i:i + chunk]),
                           jnp.asarray(b[i:i + chunk]), self._jax_weights,
                           id(self.weights))
            scores.append(np.asarray(s))
        return float(np.mean(np.concatenate(scores)))
