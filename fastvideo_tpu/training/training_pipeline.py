"""Flow-matching SFT training pipeline for DiTs.

Analog of /root/reference/fastvideo/training/training_pipeline.py:58-515:
AdamW + LR schedule, per-step {sample timesteps by density, mix noise,
velocity-target MSE}, grad clipping, checkpoint/resume, DP-sharded batches
over the mesh. The whole train step (fwd+bwd+clip+update) is ONE jitted XLA
program; gradient accumulation is a jnp accumulation of grads across
micro-batches.

FSDP analog: parameters can be sharded over the dp axis (ZeRO-3-like) via
``shard_params_fsdp`` — GSPMD inserts the per-layer all-gathers the
reference gets from torch FSDP2 (models/loader/fsdp_load.py:241).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx
from jax.sharding import NamedSharding, PartitionSpec as P

from fastvideo_tpu.fastvideo_args import TrainingArgs
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.parallel import DP_AXIS, get_mesh, maybe_init_mesh, mesh_context
from fastvideo_tpu.training.checkpoint import CheckpointManager
from fastvideo_tpu.training.training_utils import (
    clip_grad_norm, compute_density_for_timestep_sampling, get_sigmas)

logger = init_logger(__name__)

Array = jax.Array


def build_lr_schedule(args: TrainingArgs):
    base = args.learning_rate
    warmup = args.lr_warmup_steps
    if args.lr_scheduler == "constant":
        if warmup:
            return optax.linear_schedule(0.0, base, warmup)
        return base
    if args.lr_scheduler == "linear":
        return optax.linear_schedule(base, 0.0, args.max_train_steps)
    if args.lr_scheduler == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, base, warmup, args.max_train_steps)
    raise ValueError(f"unknown lr scheduler {args.lr_scheduler}")


def build_optimizer(args: TrainingArgs):
    return optax.adamw(build_lr_schedule(args), b1=args.betas[0],
                       b2=args.betas[1], weight_decay=args.weight_decay)


def shard_params_fsdp(state, mesh, min_size: int = 2**16):
    """Shard params by declared tp metadata + ZeRO-3 over dp (shard.py)."""
    from fastvideo_tpu.parallel import shard_state
    return shard_state(state, mesh, fsdp_axis=DP_AXIS, min_fsdp_size=min_size)


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int
    rng: jax.Array


class TrainingPipeline:
    """SFT on a DiT with flow-matching velocity loss."""

    def __init__(self, transformer, scheduler, training_args: TrainingArgs,
                 mesh=None):
        self.args = training_args
        self.mesh = mesh or maybe_init_mesh(training_args.mesh_config())
        self.transformer = transformer
        self.scheduler = scheduler
        if training_args.selective_checkpointing in ("full", "ops"):
            transformer.gradient_checkpointing = True
            if (training_args.selective_checkpointing == "ops"
                    and hasattr(transformer, "gradient_checkpointing_policy")):
                # keep matmul outputs, recompute elementwise chains
                transformer.gradient_checkpointing_policy = (
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
        self._frozen = None  # set by _split_model overrides (LoRA)
        self.graphdef, params = self._split_model(transformer)
        self.tx = build_optimizer(training_args)
        with mesh_context(self.mesh):
            params = shard_params_fsdp(params, self.mesh)
            if self._frozen is not None:
                self._frozen = shard_params_fsdp(self._frozen, self.mesh)
            opt_state = self.tx.init(params)
            opt_state = shard_params_fsdp(opt_state, self.mesh)
        self.state = TrainState(params=params, opt_state=opt_state, step=0,
                                rng=jax.random.PRNGKey(training_args.seed))
        self.checkpoint_manager = CheckpointManager(
            training_args.output_dir) if training_args.output_dir else None
        self._train_step = self._build_train_step()
        # per-sparsity compiled steps: the VSA top-k tile count is a
        # STATIC shape, so each sparsity level in the training ramp is its
        # own executable (reference ramps sparsity python-side per step,
        # training_pipeline.py:557-563 — eager torch pays no recompile;
        # here the ramp has sparsity/decay_rate + 1 distinct levels)
        self._train_steps_by_sparsity: dict[float, Any] = {}
        # experiment tracking (reference training_pipeline.py:200-218)
        from fastvideo_tpu.training.trackers import initialize_trackers

        names = list(getattr(training_args, "trackers", ()) or ())
        if not names and training_args.tracker_project_name:
            names = ["jsonl"]
        self.tracker = initialize_trackers(
            names, training_args.tracker_project_name or "fastvideo_tpu",
            config=dataclasses.asdict(training_args),
            log_dir=os.path.join(training_args.output_dir or ".", "tracker"),
            run_name=training_args.wandb_run_name)

    # -- the jitted step ---------------------------------------------------

    def _split_model(self, transformer):
        """graphdef + TRAINABLE params; may stash a frozen remainder on
        ``self._frozen`` (LoRA trains adapters with the base frozen)."""
        return nnx.split(transformer)

    def _merge_model(self, params, frozen=None):
        """Rebuild the model from trainable params (+ frozen remainder).
        Pure — safe to call under jit. ``frozen`` MUST be threaded in as a
        jit argument, never read off ``self`` inside a traced function:
        closure-captured device arrays are baked into the lowered module
        as literal constants (a 1.3B frozen base = ~3 GB of MLIR, which
        the compiler round-trip cannot absorb)."""
        if frozen is not None:
            return nnx.merge(self.graphdef, params, frozen)
        return nnx.merge(self.graphdef, params)

    def _make_loss_fn(self):
        """Return ``loss_fn(params, frozen, latents, embeds, key) -> scalar``.

        ``frozen`` is the non-trainable remainder (``self._frozen``,
        None for full finetuning) passed through the jit boundary.
        Subclasses override this to change the training objective while
        reusing the jitted accumulate/clip/update scaffold."""
        args = self.args
        merge = self._merge_model
        num_train = self.scheduler.num_train_timesteps
        sched_sigmas = jnp.asarray(np.asarray(self.scheduler.sigmas))
        sched_ts = jnp.asarray(np.asarray(self.scheduler.timesteps))

        def sample_sigmas(key, batch_size):
            u = compute_density_for_timestep_sampling(
                args.weighting_scheme, batch_size, key, args.logit_mean,
                args.logit_std, args.mode_scale)
            indices = jnp.clip((u * num_train).astype(jnp.int32), 0,
                               sched_ts.shape[0] - 1)
            timesteps = sched_ts[indices]
            sigmas = sched_sigmas[indices]
            return timesteps.astype(jnp.float32), sigmas

        def loss_fn(params, frozen, latents, embeds, key):
            noise_key, t_key = jax.random.split(key)
            b = latents.shape[0]
            timesteps, sigmas = sample_sigmas(t_key, b)
            sig = sigmas.reshape(b, *([1] * (latents.ndim - 1)))
            noise = jax.random.normal(noise_key, latents.shape,
                                      latents.dtype)
            noisy = (1.0 - sig) * latents + sig * noise
            model = merge(params, frozen)
            pred = model(noisy.astype(jnp.bfloat16),
                         embeds.astype(jnp.bfloat16), timesteps)
            target = noise - latents  # velocity (training_pipeline.py:413)
            return jnp.mean(
                jnp.square(pred.astype(jnp.float32) -
                           target.astype(jnp.float32)))

        return loss_fn

    def current_vsa_sparsity(self, step: int) -> float | None:
        """Reference VSA sparsity ramp (training_pipeline.py:557-563):
        sparsity grows by ``VSA_decay_rate`` every
        ``VSA_decay_interval_steps`` until it reaches ``VSA_sparsity``.
        None = no VSA metadata (dense attention / other backends)."""
        target = float(getattr(self.args, "VSA_sparsity", 0.0) or 0.0)
        if target <= 0.0:
            return None
        rate = float(getattr(self.args, "VSA_decay_rate", 0.0) or 0.0)
        interval = int(
            getattr(self.args, "VSA_decay_interval_steps", 0) or 0)
        if rate <= 0.0 or interval <= 0:
            return target
        decay_times = min(step // interval, target // rate)
        return round(decay_times * rate, 6)

    def _build_train_step(self, vsa_sparsity: float | None = None):
        args = self.args
        tx = self.tx
        loss_fn = self._make_loss_fn()
        if vsa_sparsity is not None:
            from fastvideo_tpu.attention.backends.abstract import (
                AttentionMetadata)
            from fastvideo_tpu.forward_context import set_forward_context

            base_loss_fn = loss_fn

            def loss_fn(params, frozen, latents, embeds, key):  # noqa: F811
                md = AttentionMetadata(
                    extra={"VSA_sparsity": float(vsa_sparsity)})
                with set_forward_context(attn_metadata=md):
                    return base_loss_fn(params, frozen, latents, embeds,
                                        key)

        def train_step(params, frozen, opt_state, rng, latents, embeds):
            # latents/embeds: [accum, B, ...] microbatches
            accum = latents.shape[0]
            rngs = jax.random.split(rng, accum + 1)
            step_rng, micro_rngs = rngs[0], rngs[1:]

            if accum == 1:
                # no-accumulation fast path: the fori_loop below carries a
                # full extra grads buffer (2.6 GB at 1.3B) as loop state —
                # at accum=1 that buffer is pure HBM waste and pushes a
                # 33k-token 1.3B step over a 16 GB chip at compile time
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, frozen, latents[0], embeds[0], micro_rngs[0])
            else:
                def micro(i, acc):
                    grads_acc, loss_acc = acc
                    loss, grads = jax.value_and_grad(loss_fn)(
                        params, frozen, latents[i], embeds[i],
                        micro_rngs[i])
                    grads_acc = jax.tree.map(lambda a, g: a + g / accum,
                                             grads_acc, grads)
                    return grads_acc, loss_acc + loss / accum

                zero_grads = jax.tree.map(jnp.zeros_like, params)
                grads, loss = jax.lax.fori_loop(0, accum, micro,
                                                (zero_grads, 0.0))
            grads, grad_norm = clip_grad_norm(grads, args.max_grad_norm)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, step_rng, loss, grad_norm

        return jax.jit(train_step, donate_argnums=(0, 2))

    # -- public API --------------------------------------------------------

    def train_one_step(self, latents: np.ndarray, embeds: np.ndarray,
                       vsa_sparsity: float | None = None
                       ) -> dict[str, float]:
        """latents [accum, B, C, T, H, W]; embeds [accum, B, L, D].

        ``vsa_sparsity``: per-step VSA sparsity (the training ramp). Each
        distinct value compiles once and is cached."""
        if vsa_sparsity is None:
            step_fn = self._train_step
        else:
            key = round(float(vsa_sparsity), 6)
            step_fn = self._train_steps_by_sparsity.get(key)
            if step_fn is None:
                step_fn = self._build_train_step(vsa_sparsity=key)
                self._train_steps_by_sparsity[key] = step_fn
        with mesh_context(self.mesh):
            data_sharding = NamedSharding(self.mesh, P(None, DP_AXIS))
            latents = jax.device_put(jnp.asarray(latents, jnp.float32),
                                     data_sharding)
            embeds = jax.device_put(jnp.asarray(embeds, jnp.float32),
                                    data_sharding)
            (self.state.params, self.state.opt_state, self.state.rng, loss,
             grad_norm) = step_fn(self.state.params, self._frozen,
                                  self.state.opt_state,
                                  self.state.rng, latents, embeds)
        self.state.step += 1
        out = {"loss": float(loss), "grad_norm": float(grad_norm),
               "step": self.state.step}
        if vsa_sparsity is not None:
            out["vsa_sparsity"] = float(vsa_sparsity)
        return out

    def train(self, dataloader, max_steps: int | None = None,
              log_every: int = 10, validation_callback=None,
              callbacks=None) -> None:
        """``validation_callback(pipeline, step) -> dict | None`` runs every
        ``args.validation_steps`` steps (reference _log_validation,
        training_pipeline.py:703); its metrics go to the tracker.

        ``callbacks`` is a :class:`training.callbacks.CallbackDict` (or a
        raw ``{name: cfg}`` dict) dispatched at the reference hook points
        (train/callbacks/callback.py:30-181)."""
        from fastvideo_tpu.training.callbacks import CallbackDict

        if callbacks is not None and not isinstance(callbacks,
                                                    CallbackDict):
            callbacks = CallbackDict(callbacks)
        self._callbacks = callbacks
        max_steps = max_steps or self.args.max_train_steps
        if callbacks is not None:
            callbacks.dispatch("on_train_start", self, self.state.step)
        it = iter(dataloader)
        t0 = time.perf_counter()
        while self.state.step < max_steps:
            try:
                latents, embeds = next(it)
            except StopIteration:
                it = iter(dataloader)
                latents, embeds = next(it)
            if callbacks is not None:
                callbacks.dispatch("on_before_optimizer_step", self,
                                   self.state.step)
            metrics = self.train_one_step(
                latents, embeds,
                vsa_sparsity=self.current_vsa_sparsity(self.state.step + 1))
            self.tracker.log(metrics, self.state.step)
            if callbacks is not None:
                callbacks.dispatch("on_training_step_end", self, metrics,
                                   self.state.step)
            if self.state.step % log_every == 0:
                dt = time.perf_counter() - t0
                logger.info("step %d loss %.4f grad_norm %.3f (%.2fs/it)",
                            metrics["step"], metrics["loss"],
                            metrics["grad_norm"], dt / log_every)
                t0 = time.perf_counter()
            if (validation_callback is not None
                    and self.args.validation_steps
                    and self.state.step % self.args.validation_steps == 0):
                val = validation_callback(self, self.state.step)
                if val:
                    self.tracker.log({f"validation/{k}": v
                                      for k, v in val.items()},
                                     self.state.step)
            if (self.checkpoint_manager is not None
                    and self.args.checkpointing_steps
                    and self.state.step % self.args.checkpointing_steps == 0):
                self.save_checkpoint()
        if callbacks is not None:
            callbacks.dispatch("on_train_end", self, self.state.step)

    def validation_sample(self, embeds, latent_shape: tuple[int, ...],
                          dmd_denoising_steps=(1000, 757, 522),
                          seed: int = 0):
        """Few-step sampling with the CURRENT training params (the
        reference's in-training validation videos). Returns latents."""
        from fastvideo_tpu.pipelines.stages.latent_preparation import (
            randn_like_reference)

        model = self._merge_model(self.state.params)
        latents = jnp.asarray(randn_like_reference(tuple(latent_shape),
                                                   [seed]))
        num_train = 1000.0
        steps = list(dmd_denoising_steps)
        sigmas = [t / num_train for t in steps] + [0.0]
        embeds = jnp.asarray(embeds, jnp.float32)
        for i, t in enumerate(steps):
            t_arr = jnp.full((latents.shape[0],), float(t), jnp.float32)
            v = model(latents.astype(jnp.bfloat16),
                      embeds.astype(jnp.bfloat16),
                      t_arr).astype(jnp.float32)
            x0 = latents - sigmas[i] * v
            if sigmas[i + 1] > 0:
                noise = jnp.asarray(
                    randn_like_reference(tuple(latents.shape), [seed + i + 1]))
                latents = (1 - sigmas[i + 1]) * x0 + sigmas[i + 1] * noise
            else:
                latents = x0
        return latents

    def save_checkpoint(self) -> None:
        assert self.checkpoint_manager is not None
        self.checkpoint_manager.save(self.state.step, self.state.params,
                                     self.state.opt_state, self.state.rng)

    def resume_from_checkpoint(self, step: int | None = None) -> None:
        assert self.checkpoint_manager is not None
        params, opt_state, rng, meta = self.checkpoint_manager.restore(
            self.state.params, self.state.opt_state, step)
        self.state = TrainState(params=params, opt_state=opt_state,
                                step=int(meta["step"]), rng=rng)
