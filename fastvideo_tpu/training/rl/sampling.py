"""Diffusion sampling primitives for RL training methods.

Behavior analog of /root/reference/fastvideo/train/methods/rl/common/
sampling.py: a reusable few-step sampler that works directly on the DiT
(graphdef, params) without binding RL methods to model-family pipelines.
TPU design: the whole trajectory is one jitted program (python loop over
a static step count unrolls into a single XLA computation).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_SCHEDULERS = {"flow_match_euler", "model_default"}
_TRAJECTORIES = {"ode", "sde_reflow"}


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """YAML-backed sampling knobs (reference sampling.py:21-88)."""

    num_steps: int = 25
    scheduler: str = "model_default"
    trajectory: str = "ode"
    flow_shift: float | None = None
    timesteps: tuple[float, ...] | None = None
    sigmas: tuple[float, ...] | None = None

    @classmethod
    def from_mapping(cls, raw: dict[str, Any] | None) -> "SamplingConfig":
        if raw is None:
            return cls()
        if not isinstance(raw, dict):
            raise ValueError("method.sampling must be a mapping, got "
                             f"{type(raw).__name__}")
        supported = {"flow_shift", "num_steps", "scheduler", "sigmas",
                     "timesteps", "trajectory"}
        unknown = sorted(set(raw) - supported)
        if unknown:
            raise ValueError(f"Unsupported method.sampling key(s): {unknown}."
                             f" Supported keys: {sorted(supported)}")
        scheduler = str(raw.get("scheduler") or "model_default").lower()
        if scheduler not in _SCHEDULERS:
            raise ValueError("method.sampling.scheduler must be one of "
                             f"{sorted(_SCHEDULERS)}, got {scheduler!r}")
        trajectory = str(raw.get("trajectory") or "ode").lower()
        if trajectory not in _TRAJECTORIES:
            raise ValueError("method.sampling.trajectory must be one of "
                             f"{sorted(_TRAJECTORIES)}, got {trajectory!r}")
        timesteps = raw.get("timesteps")
        sigmas = raw.get("sigmas")
        if timesteps is not None:
            if not isinstance(timesteps, list) or not timesteps:
                raise ValueError(
                    "method.sampling.timesteps must be a non-empty list")
            timesteps = tuple(float(t) for t in timesteps)
        if sigmas is not None:
            if not isinstance(sigmas, list) or not sigmas:
                raise ValueError(
                    "method.sampling.sigmas must be a non-empty list")
            sigmas = tuple(float(s) for s in sigmas)
        if (timesteps is not None and sigmas is not None
                and len(timesteps) != len(sigmas)):
            raise ValueError("method.sampling.timesteps and sigmas must "
                             "have the same length")
        num_steps = int(raw.get("num_steps", 25) or 25)
        if num_steps <= 0:
            raise ValueError("method.sampling.num_steps must be positive")
        shift = raw.get("flow_shift")
        return cls(num_steps=num_steps, scheduler=scheduler,
                   trajectory=trajectory,
                   flow_shift=None if shift in (None, "inherit")
                   else float(shift),
                   timesteps=timesteps, sigmas=sigmas)


@dataclasses.dataclass
class SamplingResult:
    latents: Array          # [B, ...] clean samples
    timesteps: np.ndarray   # [num_steps] schedule actually used
    sigmas: np.ndarray      # [num_steps + 1]


class DiffusionSampler:
    """Few-step flow-matching sampler over a (graphdef, params) DiT.

    ``trajectory='ode'`` is plain Euler on the velocity field;
    ``'sde_reflow'`` renoises to the next sigma with fresh noise after
    each x0 estimate (the reference's stochastic reflow trajectory).
    """

    def __init__(self, config: SamplingConfig,
                 num_train_timesteps: int = 1000):
        self.config = config
        self.num_train = num_train_timesteps
        self._jit_cache: dict = {}

    def schedule(self) -> tuple[np.ndarray, np.ndarray]:
        """(timesteps [n], sigmas [n+1]) honoring explicit overrides and
        the flow shift (sigma' = s*sigma / (1 + (s-1)*sigma))."""
        cfg = self.config
        if cfg.sigmas is not None:
            sig = np.asarray(cfg.sigmas, np.float32)
        elif cfg.timesteps is not None:
            sig = np.asarray(cfg.timesteps, np.float32) / self.num_train
        else:
            sig = np.linspace(1.0, 1.0 / cfg.num_steps, cfg.num_steps,
                              dtype=np.float32)
            shift = cfg.flow_shift
            if shift is not None and shift != 1.0:
                sig = shift * sig / (1.0 + (shift - 1.0) * sig)
        sigmas = np.concatenate([sig, [0.0]]).astype(np.float32)
        timesteps = (sigmas[:-1] * self.num_train).astype(np.float32)
        return timesteps, sigmas

    def _build(self, graphdef, n_steps: int):
        from flax import nnx

        stochastic = self.config.trajectory == "sde_reflow"

        def run(params, noise, embeds, timesteps, sigmas, key):
            model = nnx.merge(graphdef, params)
            x = noise
            keys = jax.random.split(key, n_steps)
            for i in range(n_steps):
                t = jnp.full((noise.shape[0],), timesteps[i], jnp.float32)
                v = model(x.astype(jnp.bfloat16),
                          embeds.astype(jnp.bfloat16), t).astype(jnp.float32)
                sig, nsig = sigmas[i], sigmas[i + 1]
                if stochastic:
                    x0 = x - sig * v
                    fresh = jax.random.normal(keys[i], x.shape, x.dtype)
                    x = (1 - nsig) * x0 + nsig * fresh
                else:
                    x = x + (nsig - sig) * v
            return x

        return jax.jit(run)

    def sample(self, graphdef, params, noise: Array, embeds: Array,
               key: Array) -> SamplingResult:
        timesteps, sigmas = self.schedule()
        n = len(timesteps)
        if n not in self._jit_cache:
            self._jit_cache[n] = self._build(graphdef, n)
        latents = self._jit_cache[n](params, noise, embeds,
                                     jnp.asarray(timesteps),
                                     jnp.asarray(sigmas), key)
        return SamplingResult(latents=latents, timesteps=timesteps,
                              sigmas=sigmas)
