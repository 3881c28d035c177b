"""Fine-tuning methods (reference train/methods/fine_tuning/).

``sft`` wraps the flow-matching SFT pipeline behind the plugin protocol
(reference finetune.py); ``dfsft`` is diffusion-forcing SFT — a CAUSAL
student trained with per-chunk inhomogeneous timesteps under the
blockwise-causal mask, with Gaussian timestep weighting (reference
dfsft.py:17-374); ``tfsft`` is its teacher-forcing subclass: the noisy
chunks additionally attend a clean copy of all strictly-previous chunks
(reference tfsft.py:13-30, mask semantics causal_wanvideo.py:504-565).
"""

from __future__ import annotations

import numpy as np

from fastvideo_tpu.training.methods.base import (PipelineMethod,
                                                 register_method)
from fastvideo_tpu.training.run_config import (TrainRunConfig,
                                               build_training_args,
                                               build_transformer)
from fastvideo_tpu.training.training_pipeline import TrainingPipeline


@register_method
class SFTMethod(PipelineMethod):
    """Flow-matching supervised fine-tuning."""

    name = "sft"

    @classmethod
    def from_config(cls, cfg: TrainRunConfig) -> "SFTMethod":
        from fastvideo_tpu.models.schedulers.flow_match_euler import (
            FlowMatchEulerDiscreteScheduler)

        targs = build_training_args(cfg)
        scheduler = FlowMatchEulerDiscreteScheduler(
            shift=cfg.model.flow_shift)
        scheduler.set_timesteps(1000)
        transformer = build_transformer(cfg.model)
        return cls(TrainingPipeline(transformer, scheduler, targs))


def gaussian_timestep_weights(n: int) -> np.ndarray:
    """bsmntw weighting: emphasize mid-noise, down-weight extremes
    (reference dfsft.py:356-369)."""
    x = np.arange(n, dtype=np.float32)
    y = np.exp(-2.0 * ((x - n / 2) / n) ** 2)
    y = y - y.min()
    return y * (n / y.sum())


class DiffusionForcingPipeline(TrainingPipeline):
    """SFT on a causal DiT with per-chunk inhomogeneous timesteps.

    The loss follows reference dfsft.py:63-180: sample one timestep index
    per (batch, chunk), expand to frames, add flow noise per frame, run the
    blockwise-causal ``train_forward``, and take the Gaussian-weighted
    per-frame x0 MSE (``precondition_outputs``) or velocity MSE.
    """

    def __init__(self, transformer, scheduler, training_args, *,
                 chunk_size: int | None = None,
                 min_timestep_ratio: float = 0.0,
                 max_timestep_ratio: float = 1.0,
                 precondition_outputs: bool = True,
                 teacher_forcing: bool = False, mesh=None):
        expected = getattr(transformer.config, "num_frames_per_block", None)
        if chunk_size is None:
            chunk_size = int(expected or 3)
        if expected is not None and int(expected) != int(chunk_size):
            raise ValueError(
                "DFSFT chunk_size must match transformer."
                f"num_frames_per_block (got {chunk_size}, expected "
                f"{expected})")
        self.chunk_size = int(chunk_size)
        self.min_timestep_ratio = float(min_timestep_ratio)
        self.max_timestep_ratio = float(max_timestep_ratio)
        self.precondition_outputs = bool(precondition_outputs)
        self.teacher_forcing = bool(teacher_forcing)
        super().__init__(transformer, scheduler, training_args, mesh=mesh)

    def _timestep_index_range(self) -> tuple[int, int]:
        """[low, high) indices into scheduler.timesteps
        (reference dfsft.py:276-308)."""
        n = len(self.scheduler.timesteps)
        lo = max(0, min(int(self.min_timestep_ratio * n), n - 1))
        hi = max(0, min(int(self.max_timestep_ratio * n), n - 1))
        if hi <= lo:
            hi = min(n - 1, lo + 1)
        return lo, hi + 1

    def _make_loss_fn(self):
        import jax
        import jax.numpy as jnp
        from flax import nnx

        graphdef = self.graphdef
        chunk = self.chunk_size
        lo, hi = self._timestep_index_range()
        sched_ts = jnp.asarray(np.asarray(self.scheduler.timesteps))
        sched_sigmas = jnp.asarray(
            np.asarray(self.scheduler.sigmas, np.float32))
        weights = jnp.asarray(gaussian_timestep_weights(len(sched_ts)))
        precondition = self.precondition_outputs
        teacher_forcing = self.teacher_forcing

        def loss_fn(params, frozen, latents, embeds, key):
            del frozen  # no frozen remainder in this method
            # latents [B, C, T, H, W]
            noise_key, t_key = jax.random.split(key)
            b, _, t, _, _ = latents.shape
            num_chunks = -(-t // chunk)
            idx_chunk = jax.random.randint(t_key, (b, num_chunks), lo, hi)
            idx = jnp.repeat(idx_chunk, chunk, axis=1)[:, :t]  # [B, T]
            t_inhom = sched_ts[idx].astype(jnp.float32)
            sigmas = sched_sigmas[idx]  # [B, T]
            sig = sigmas[:, None, :, None, None]
            noise = jax.random.normal(noise_key, latents.shape,
                                      latents.dtype)
            noisy = (1.0 - sig) * latents + sig * noise
            model = nnx.merge(graphdef, params)
            clean_x = latents.astype(jnp.bfloat16) if teacher_forcing \
                else None
            pred = model.train_forward(
                noisy.astype(jnp.bfloat16), embeds.astype(jnp.bfloat16),
                t_inhom, clean_x=clean_x).astype(jnp.float32)
            if precondition:
                pred_x0 = noisy.astype(jnp.float32) - pred * sig
                per_frame = jnp.mean(
                    jnp.square(pred_x0 - latents.astype(jnp.float32)),
                    axis=(1, 3, 4))  # [B, T]
            else:
                target = (noise - latents).astype(jnp.float32)
                per_frame = jnp.mean(jnp.square(pred - target),
                                     axis=(1, 3, 4))
            return jnp.mean(per_frame * weights[idx])

        return loss_fn


def _build_df_pipeline(cfg: TrainRunConfig,
                       teacher_forcing: bool) -> DiffusionForcingPipeline:
    from fastvideo_tpu.models.schedulers.flow_match_euler import (
        FlowMatchEulerDiscreteScheduler)

    targs = build_training_args(cfg)
    scheduler = FlowMatchEulerDiscreteScheduler(shift=cfg.model.flow_shift)
    scheduler.set_timesteps(1000)
    transformer = build_transformer(cfg.model)
    mc = cfg.method_config
    return DiffusionForcingPipeline(
        transformer, scheduler, targs,
        chunk_size=mc.get("chunk_size"),
        min_timestep_ratio=float(mc.get("min_timestep_ratio", 0.0)),
        max_timestep_ratio=float(mc.get("max_timestep_ratio", 1.0)),
        precondition_outputs=bool(mc.get("precondition_outputs", True)),
        teacher_forcing=teacher_forcing)


@register_method
class DiffusionForcingSFTMethod(PipelineMethod):
    """Diffusion-forcing SFT on a causal student (reference dfsft.py)."""

    name = "dfsft"

    @classmethod
    def from_config(cls, cfg: TrainRunConfig) -> "DiffusionForcingSFTMethod":
        return cls(_build_df_pipeline(cfg, teacher_forcing=False))


@register_method
class TeacherForcingSFTMethod(PipelineMethod):
    """Teacher-forcing SFT: clean context for previous chunks
    (reference tfsft.py)."""

    name = "tfsft"

    @classmethod
    def from_config(cls, cfg: TrainRunConfig) -> "TeacherForcingSFTMethod":
        return cls(_build_df_pipeline(cfg, teacher_forcing=True))
