"""AnyFlow pretrain: flow-map central-difference training (stage 1).

Behavioral reference: /root/reference/fastvideo/train/methods/
distribution_matching/anyflow_pretrain.py (:41-371). Trains a single
student ``u_theta(x_t, t, r)`` (dual-timestep ``r_embedder`` Wan trunk) to
predict the average velocity from ``t`` back to ``r`` via the
central-difference target

    target = (eps - x0) - ((t - r) / N) * dF/dt,
    dF/dt  ~= [u(x_{t+d}, t+d, r) - u(x_{t-d}, t-d, r)] / (2 d)

with the two finite-difference forwards under ``stop_gradient``, per-batch
(t, r) sampling split into diffusion (r = t) / consistency (r = 0) / free
(max, min of two uniforms) fractions, flow-shift applied to both times, a
per-timestep train weight, and stop-grad scale-balancing of the
non-diffusion branches onto the diffusion branch's magnitude.

TPU shape: the whole loss (three trunk forwards) is one jitted function
built through ``TrainingPipeline._make_loss_fn``; branch membership is a
static index split (batch size is static under jit), so masks compile to
``jnp.where`` with no host sync.
"""

from __future__ import annotations

from fastvideo_tpu.training.methods.base import (PipelineMethod,
                                                 register_method)
from fastvideo_tpu.training.run_config import (TrainRunConfig,
                                               build_training_args,
                                               build_transformer)
from fastvideo_tpu.training.training_pipeline import TrainingPipeline


class AnyFlowPretrainPipeline(TrainingPipeline):
    """Flow-map central-difference SFT (reference anyflow_pretrain.py)."""

    def __init__(self, transformer, scheduler, training_args, *,
                 diffusion_ratio: float = 0.5,
                 consistency_ratio: float = 0.25,
                 fd_epsilon: float = 5.0,
                 weight_type: str = "beta08", mesh=None):
        if diffusion_ratio < 0 or consistency_ratio < 0:
            raise ValueError("ratios must be non-negative")
        if diffusion_ratio + consistency_ratio > 1.0:
            raise ValueError(
                "diffusion_ratio + consistency_ratio must be <= 1, got "
                f"{diffusion_ratio} + {consistency_ratio}")
        if fd_epsilon <= 0:
            raise ValueError("fd_epsilon must be positive")
        if weight_type not in ("uniform", "gaussian", "beta08"):
            raise ValueError(f"unknown weight_type {weight_type!r}")
        if transformer.condition_embedder.delta_embedder is None:
            raise ValueError(
                "anyflow_pretrain needs a transformer built with "
                "r_embedder=True (arch_overrides)")
        self.diffusion_ratio = float(diffusion_ratio)
        self.consistency_ratio = float(consistency_ratio)
        self.fd_epsilon = float(fd_epsilon)
        self.weight_type = weight_type
        super().__init__(transformer, scheduler, training_args, mesh=mesh)

    def _make_loss_fn(self):
        import jax
        import jax.numpy as jnp
        from flax import nnx

        graphdef = self.graphdef
        sched = self.scheduler
        n_train = float(sched.num_train_timesteps)
        delta = self.fd_epsilon
        weight_type = self.weight_type
        d_ratio, c_ratio = self.diffusion_ratio, self.consistency_ratio

        def loss_fn(params, frozen, latents, embeds, key):
            del frozen  # no frozen remainder in this method
            # latents [B, C, T, H, W] fp32
            t_key, noise_key = jax.random.split(key)
            b = latents.shape[0]
            u = jax.random.uniform(t_key, (2, b))
            t_norm = jnp.maximum(u[0], u[1])
            r_norm = jnp.minimum(u[0], u[1])
            # branch membership: first n_diff entries are the diffusion
            # branch, next n_cons the consistency branch (reference
            # :79-94; the draw is iid so position carries no information)
            n_diff = int(d_ratio * b)
            n_cons = int(c_ratio * b)
            idx = jnp.arange(b)
            is_diff = idx < n_diff
            is_cons = (idx >= n_diff) & (idx < n_diff + n_cons)
            r_norm = jnp.where(is_diff, t_norm, r_norm)
            r_norm = jnp.where(is_cons, jnp.zeros_like(r_norm), r_norm)

            t = jnp.asarray(sched.apply_shift(t_norm),
                            jnp.float32) * n_train
            r = jnp.asarray(sched.apply_shift(r_norm),
                            jnp.float32) * n_train

            noise = jax.random.normal(noise_key, latents.shape,
                                      latents.dtype)
            noisy = sched.add_noise(latents, noise, t)

            model = nnx.merge(graphdef, params)
            embeds_b = embeds.astype(jnp.bfloat16)

            def fwd(x, tt):
                return model(x.astype(jnp.bfloat16), embeds_b, tt,
                             r_timestep=r).astype(jnp.float32)

            pred = fwd(noisy, t)

            # central difference, both forwards outside the grad graph;
            # the sample moves along the TRUE flow by the same step
            # (reference :95-141)
            v_true = (noise - latents).astype(jnp.float32)
            dx = delta / n_train
            f_plus = jax.lax.stop_gradient(
                fwd(noisy + v_true * dx, t + delta))
            f_minus = jax.lax.stop_gradient(
                fwd(noisy - v_true * dx, t - delta))
            df_dt = (f_plus - f_minus) / (2.0 * delta)

            view = (b,) + (1,) * (latents.ndim - 1)
            target = v_true - (t - r).reshape(view) * df_dt

            per_sample = jnp.mean(
                jnp.square(pred - target).reshape(b, -1), axis=-1)
            per_sample = per_sample * sched.get_train_weight(
                t, weight_type=weight_type)

            # stop-grad rescale of the non-diffusion branches onto the
            # diffusion branch's magnitude (reference :343-357)
            ps_sg = jax.lax.stop_gradient(per_sample)
            n_d = jnp.maximum(jnp.sum(is_diff), 1)
            diff_mean = jnp.where(
                jnp.any(is_diff),
                jnp.sum(jnp.where(is_diff, ps_sg, 0.0)) / n_d,
                jnp.mean(ps_sg))
            scale = diff_mean / (ps_sg + 1e-5)
            per_sample = jnp.where(is_diff, per_sample,
                                   per_sample * scale)
            return jnp.mean(per_sample)

        return loss_fn


@register_method
class AnyFlowPretrainMethod(PipelineMethod):
    """AnyFlow stage-1 pretrain (reference anyflow_pretrain.py)."""

    name = "anyflow_pretrain"

    @classmethod
    def from_config(cls, cfg: TrainRunConfig) -> "AnyFlowPretrainMethod":
        import os

        import jax
        import jax.numpy as jnp
        from flax import nnx

        from fastvideo_tpu.models.loader.safetensors_io import (
            find_safetensors_files)
        from fastvideo_tpu.models.schedulers.scheduling_flow_map_euler import (
            FlowMapEulerDiscreteScheduler)

        targs = build_training_args(cfg)
        mc = cfg.method_config
        shift = float(cfg.model.flow_shift or mc.get("shift", 1.0))
        scheduler = FlowMapEulerDiscreteScheduler(shift=shift)
        transformer = build_transformer(
            cfg.model, arch_overrides={
                "r_embedder": True,
                "r_embedder_fusion": mc.get("r_embedder_fusion", "additive"),
                "r_embedder_gate_value": float(
                    mc.get("r_embedder_gate_value", 0.25)),
                "r_embedder_deltatime_type": mc.get(
                    "r_embedder_deltatime_type", "r"),
            })

        # Reference initializes delta_embedder as a deep copy of
        # time_embedder (wanvideo.py:102-104); mirror that when the
        # checkpoint has no delta weights of its own.
        tdir = os.path.join(cfg.model.pretrained_model_path, "transformer")
        has_delta = any(
            "delta_embedder" in k for p in find_safetensors_files(tdir)
            for k in _safetensors_keys(p))
        if not has_delta:
            ce = transformer.condition_embedder
            src = nnx.state(ce.time_embedder)
            nnx.update(ce.delta_embedder, jax.tree.map(jnp.copy, src))

        return cls(AnyFlowPretrainPipeline(
            transformer, scheduler, targs,
            diffusion_ratio=float(mc.get("diffusion_ratio", 0.5)),
            consistency_ratio=float(mc.get("consistency_ratio", 0.25)),
            fd_epsilon=float(mc.get("epsilon", 5.0)),
            weight_type=str(mc.get("weight_type", "beta08")).lower()))


def _safetensors_keys(path: str):
    from safetensors import safe_open

    with safe_open(path, framework="numpy") as f:
        return list(f.keys())
