"""DiffusionNFT multi-reward policy optimization (RL post-training).

Behavior analog of /root/reference/fastvideo/train/methods/rl/
diffusion_nft.py: one outer step = sample-with-old-policy -> score with
the multi-reward scorer -> GRPO-style group-relative advantages ->
inner NFT update of the student against the old + frozen reference
policies -> return-decay sync of the old policy.

TPU design notes:
- The three roles (student / old / reference) are parameter pytrees over
  one shared graphdef; the inner update is a single jitted program that
  accumulates the NFT loss over every trained timestep of the sampling
  schedule and applies ONE optimizer step (the reference reaches the
  same effective batch via gradient accumulation over timesteps,
  diffusion_nft.py:526-634).
- Sampling runs on the old policy through
  :class:`~fastvideo_tpu.training.rl.sampling.DiffusionSampler` — one
  jitted trajectory program.
- Reward scoring happens on host (numpy media), matching the reference's
  CPU-side reward models.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fastvideo_tpu.fastvideo_args import TrainingArgs
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.parallel import maybe_init_mesh, mesh_context
from fastvideo_tpu.training.rl.rewards import MultiRewardScorer
from fastvideo_tpu.training.rl.sampling import (DiffusionSampler,
                                                SamplingConfig)
from fastvideo_tpu.training.training_pipeline import build_optimizer
from fastvideo_tpu.training.training_utils import clip_grad_norm

logger = init_logger(__name__)

Array = jax.Array

_ADV_MODES = {"all", "positive_only", "negative_only", "one_only", "binary"}


@dataclasses.dataclass(frozen=True)
class DiffusionNFTConfig:
    """Method knobs (reference diffusion_nft.py:106-135 defaults)."""

    num_video_per_prompt: int = 4
    adv_clip_max: float = 5.0
    timestep_fraction: float = 0.99
    kl_beta: float = 1e-4
    nft_beta: float = 0.1
    decay_type: int = 1
    adv_mode: str = "all"
    num_train_timesteps: int = 1000
    ema_decay: float = 0.0

    def __post_init__(self):
        if self.adv_mode not in _ADV_MODES:
            raise ValueError(f"adv_mode must be one of {sorted(_ADV_MODES)},"
                             f" got {self.adv_mode!r}")
        if self.decay_type not in (0, 1, 2):
            raise ValueError(f"Unsupported decay_type: {self.decay_type}")


def return_decay(step: int, decay_type: int) -> float:
    """Old-policy sync decay schedule (reference :835-848)."""
    if decay_type == 0:
        flat, uprate, uphold = 0, 0.0, 0.0
    elif decay_type == 1:
        flat, uprate, uphold = 0, 0.001, 0.5
    elif decay_type == 2:
        flat, uprate, uphold = 75, 0.0075, 0.999
    else:
        raise ValueError(f"Unsupported decay_type: {decay_type}")
    if step < flat:
        return 0.0
    return min((step - flat) * uprate, uphold)


def compute_group_advantages(prompts: Sequence[str],
                             rewards: np.ndarray,
                             eps: float = 1e-4) -> np.ndarray:
    """GRPO group-relative advantages: per-prompt (r - mean) / (std + eps)
    (reference _compute_advantages :496-524, single-host form)."""
    rewards = np.asarray(rewards, np.float64)
    adv = np.empty_like(rewards)
    groups: dict[str, list[int]] = defaultdict(list)
    for i, p in enumerate(prompts):
        groups[p].append(i)
    for idx in groups.values():
        g = rewards[idx]
        adv[idx] = (g - g.mean()) / (g.std() + eps)
    return adv.astype(np.float32)


class DiffusionNFTPipeline:
    """Sample -> score -> NFT inner update, one outer step per call."""

    def __init__(self, student, training_args: TrainingArgs,
                 reward_scorer: MultiRewardScorer,
                 nft_config: DiffusionNFTConfig | None = None,
                 sampling: SamplingConfig | None = None,
                 decode_fn: Callable[[Array], np.ndarray] | None = None,
                 mesh=None):
        from flax import nnx

        self.args = training_args
        self.cfg = nft_config or DiffusionNFTConfig()
        self.mesh = mesh or maybe_init_mesh(training_args.mesh_config())
        self.reward_scorer = reward_scorer
        # media for scoring defaults to the raw latents when no decoder is
        # attached (the reference always decodes; tests inject identity)
        self.decode_fn = decode_fn or (lambda lat: np.asarray(lat))

        self.graphdef, self.student_params = nnx.split(student)
        self.old_params = jax.tree.map(jnp.copy, self.student_params)
        self.ref_params = jax.tree.map(jnp.copy, self.student_params)
        self.ema_params = (jax.tree.map(jnp.copy, self.student_params)
                           if self.cfg.ema_decay else None)

        self.tx = build_optimizer(training_args)
        self.opt = self.tx.init(self.student_params)
        self.sampler = DiffusionSampler(
            sampling or SamplingConfig(num_steps=4),
            num_train_timesteps=self.cfg.num_train_timesteps)
        self.rng = jax.random.PRNGKey(training_args.seed)
        self.step = 0
        self._nft_steps: dict[int, Any] = {}
        self._lerp = jax.jit(lambda old, new, d: jax.tree.map(
            lambda o, s: o * d + s * (1.0 - d), old, new))

    # -- inner objective -----------------------------------------------------

    def _num_train_timesteps(self) -> int:
        n = len(self.sampler.schedule()[0])
        return max(1, min(n, int(n * self.cfg.timestep_fraction)))

    def _shape_advantages(self, adv: Array) -> Array:
        """Clip + mode-transform + normalize to r in [0,1]
        (reference :705-719)."""
        cmax = self.cfg.adv_clip_max
        a = jnp.clip(adv, -cmax, cmax)
        mode = self.cfg.adv_mode
        if mode == "positive_only":
            a = jnp.clip(a, 0, cmax)
        elif mode == "negative_only":
            a = jnp.clip(a, -cmax, 0)
        elif mode == "one_only":
            a = jnp.where(a > 0, 1.0, 0.0)
        elif mode == "binary":
            a = jnp.sign(a)
        return jnp.clip((a / cmax) / 2.0 + 0.5, 0.0, 1.0)

    def _build_nft_step(self, n_timesteps: int):
        from flax import nnx

        beta = self.cfg.nft_beta
        kl_beta = self.cfg.kl_beta
        cmax = self.cfg.adv_clip_max

        def per_t_loss(student_params, old_params, ref_params, x0, embeds,
                       r, t_val, key):
            t = jnp.full((x0.shape[0],), t_val, jnp.float32)
            te = (t / self.cfg.num_train_timesteps).reshape(
                -1, *([1] * (x0.ndim - 1)))
            noise = jax.random.normal(key, x0.shape, jnp.float32)
            xt = (1 - te) * x0 + te * noise

            def fwd(params):
                model = nnx.merge(self.graphdef, params)
                return model(xt.astype(jnp.bfloat16),
                             embeds.astype(jnp.bfloat16),
                             t).astype(jnp.float32)

            old_pred = jax.lax.stop_gradient(fwd(old_params))
            ref_pred = jax.lax.stop_gradient(fwd(ref_params))
            pred = fwd(student_params)

            pos_pred = beta * pred + (1 - beta) * old_pred
            neg_pred = (1 + beta) * old_pred - beta * pred
            axes = tuple(range(1, x0.ndim))

            x0_pos = xt - te * pos_pred
            w_pos = jax.lax.stop_gradient(
                jnp.clip(jnp.mean(jnp.abs(x0_pos - x0), axis=axes,
                                  keepdims=True), 1e-5, None))
            pos_loss = jnp.mean(jnp.square(x0_pos - x0) / w_pos, axis=axes)

            x0_neg = xt - te * neg_pred
            w_neg = jax.lax.stop_gradient(
                jnp.clip(jnp.mean(jnp.abs(x0_neg - x0), axis=axes,
                                  keepdims=True), 1e-5, None))
            neg_loss = jnp.mean(jnp.square(x0_neg - x0) / w_neg, axis=axes)

            ori = r * pos_loss / beta + (1 - r) * neg_loss / beta
            policy_loss = jnp.mean(ori * cmax)
            kl = jnp.mean(jnp.square(pred - ref_pred))
            return policy_loss + kl_beta * kl, policy_loss, kl

        def loss_fn(student_params, old_params, ref_params, x0, embeds, r,
                    timesteps, key):
            keys = jax.random.split(key, n_timesteps)
            total = policy = kl = 0.0
            for i in range(n_timesteps):
                li, pi, ki = per_t_loss(student_params, old_params,
                                        ref_params, x0, embeds, r,
                                        timesteps[i], keys[i])
                total, policy, kl = total + li, policy + pi, kl + ki
            n = float(n_timesteps)
            return total / n, (policy / n, kl / n)

        def step(student_params, opt, old_params, ref_params, rng, x0,
                 embeds, adv, timesteps):
            rng, key = jax.random.split(rng)
            r = self._shape_advantages(adv)
            (loss, (policy, kl)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(student_params, old_params,
                                       ref_params, x0, embeds, r, timesteps,
                                       key)
            grads, gnorm = clip_grad_norm(grads, self.args.max_grad_norm)
            updates, opt = self.tx.update(grads, opt, student_params)
            student_params = optax.apply_updates(student_params, updates)
            return student_params, opt, rng, loss, policy, kl, gnorm

        return jax.jit(step)

    # -- outer loop ----------------------------------------------------------

    def train_one_step(self, prompts: Sequence[str], embeds: np.ndarray,
                       latent_shape: tuple[int, ...]) -> dict:
        """One outer NFT epoch on a prompt batch.

        ``prompts``: [P] strings; ``embeds``: [P, L, D] text embeddings;
        ``latent_shape``: per-sample latent shape (C, ...). Each prompt is
        repeated ``num_video_per_prompt`` times for group advantages.
        """
        k = self.cfg.num_video_per_prompt
        rep_prompts = [p for p in prompts for _ in range(k)]
        embeds = np.asarray(embeds, np.float32)
        rep_embeds = jnp.asarray(np.repeat(embeds, k, axis=0))
        n = len(rep_prompts)

        with mesh_context(self.mesh):
            self.rng, k_noise = jax.random.split(self.rng)
            noise = jax.random.normal(k_noise, (n, *latent_shape),
                                      jnp.float32)
            self.rng, k_samp = jax.random.split(self.rng)
            result = self.sampler.sample(self.graphdef, self.old_params,
                                         noise, rep_embeds, k_samp)
            media = self.decode_fn(result.latents)
            rewards = self.reward_scorer(media, rep_prompts)
            adv = compute_group_advantages(rep_prompts, rewards["avg"])

            n_t = self._num_train_timesteps()
            if n_t not in self._nft_steps:
                self._nft_steps[n_t] = self._build_nft_step(n_t)
            (self.student_params, self.opt, self.rng, loss, policy, kl,
             gnorm) = self._nft_steps[n_t](
                 self.student_params, self.opt, self.old_params,
                 self.ref_params, self.rng,
                 jax.lax.stop_gradient(result.latents), rep_embeds,
                 jnp.asarray(adv), jnp.asarray(result.timesteps[:n_t]))

            decay = return_decay(self.step, self.cfg.decay_type)
            self.old_params = self._lerp(self.old_params,
                                         self.student_params, decay)
            if self.ema_params is not None:
                self.ema_params = self._lerp(self.ema_params,
                                             self.student_params,
                                             self.cfg.ema_decay)

        self.step += 1
        metrics = {
            "step": self.step,
            "total_loss": float(loss),
            "policy_loss": float(policy),
            "kl_div_loss": float(kl),
            "grad_norm": float(gnorm),
            "old_decay": decay,
        }
        for name, vals in rewards.items():
            metrics[f"reward/{name}"] = float(np.mean(vals))
        return metrics

    def train(self, dataloader, max_steps: int | None = None,
              log_every: int = 10, callbacks=None) -> None:
        """Outer loop over a (prompts, embeds, latent_shape) dataloader."""
        from fastvideo_tpu.training.callbacks import normalize_callbacks

        callbacks = normalize_callbacks(callbacks)
        max_steps = max_steps or self.args.max_train_steps
        if callbacks is not None:
            callbacks.dispatch("on_train_start", self, self.step)
        it = iter(dataloader)
        while self.step < max_steps:
            try:
                batch = next(it)
            except StopIteration:
                it = iter(dataloader)
                batch = next(it)
            prompts, embeds, latent_shape = batch
            metrics = self.train_one_step(prompts, embeds,
                                          tuple(latent_shape))
            if callbacks is not None:
                callbacks.dispatch("on_training_step_end", self, metrics,
                                   self.step)
            if self.step % log_every == 0:
                logger.info("diffusion_nft step %d %s", self.step,
                            {k: round(v, 4)
                             for k, v in metrics.items()
                             if isinstance(v, float)})
        if callbacks is not None:
            callbacks.dispatch("on_train_end", self, self.step)
