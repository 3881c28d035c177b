"""ODE-trajectory preprocess: captions -> teacher denoising trajectories.

Analog of /root/reference/fastvideo/pipelines/preprocess/
preprocess_pipeline_ode_trajectory.py: run the TEACHER sampler over
text-only prompts and record the latent at every solver step plus the
matching timesteps — the data sparse-distillation students (DMD2,
self-forcing) regress onto.

TPU shape: the whole trajectory is ONE jitted ``lax.scan`` over solver
steps (stacked [S, ...] output) — no per-step host round-trips; CFG runs
cond/uncond in the same call.
"""

from __future__ import annotations

import os
from collections.abc import Iterable
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.dataset.parquet import (pyarrow_schema_ode,
                                           record_from_ode_sample,
                                           write_parquet_dataset)
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.pipelines.preprocess.preprocess_pipeline import (
    PreprocessPipeline)

logger = init_logger(__name__)


class PreprocessPipelineODE(PreprocessPipeline):
    """Teacher-trajectory collection over text-only records."""

    def __init__(self, vae, text_encoder, tokenizer, transformer,
                 scheduler=None, num_inference_steps: int = 48,
                 guidance_scale: float = 6.0, negative_prompt: str = "",
                 latent_shape: tuple[int, ...] = (16, 21, 60, 104),
                 text_len: int = 512, samples_per_file: int = 8,
                 seed: int = 42):
        super().__init__(vae, text_encoder, tokenizer, text_len=text_len,
                         samples_per_file=samples_per_file)
        if scheduler is None:
            from fastvideo_tpu.models.schedulers.\
                scheduling_self_forcing_flow_match import (
                    SelfForcingFlowMatchScheduler)

            # reference ODE pipeline pins shift=5, sigma_min=0,
            # extra_one_step (preprocess_pipeline_ode_trajectory.py:53-57)
            scheduler = SelfForcingFlowMatchScheduler(
                shift=5.0, sigma_min=0.0, extra_one_step=True)
        scheduler.set_timesteps(num_inference_steps, denoising_strength=1.0)
        self.scheduler = scheduler
        self.guidance_scale = float(guidance_scale)
        self.negative_prompt = negative_prompt
        self.latent_shape = tuple(latent_shape)
        self.seed = seed
        self._graphdef, self._params = nnx.split(transformer)
        self._run = self._build_sampler()

    def _build_sampler(self):
        sigmas = jnp.asarray(np.asarray(self.scheduler.sigmas), jnp.float32)
        timesteps = jnp.asarray(np.asarray(self.scheduler.timesteps),
                                jnp.float32)
        sig_next = jnp.concatenate([sigmas[1:], jnp.zeros((1,))])
        guidance = self.guidance_scale
        graphdef = self._graphdef

        @partial(jax.jit, static_argnames=())
        def run(params, latents, embeds, neg_embeds):
            model = nnx.merge(graphdef, params)

            def step(x, inp):
                t, s, s1 = inp
                tb = jnp.full((x.shape[0],), t, jnp.float32)
                v = model(x.astype(jnp.bfloat16),
                          embeds.astype(jnp.bfloat16),
                          tb).astype(jnp.float32)
                if guidance > 1.0:
                    v_u = model(x.astype(jnp.bfloat16),
                                neg_embeds.astype(jnp.bfloat16),
                                tb).astype(jnp.float32)
                    v = v_u + guidance * (v - v_u)
                x1 = x + (s1 - s)[None] * v
                return x1, x1

            _, traj = jax.lax.scan(step, latents.astype(jnp.float32),
                                   (timesteps, sigmas, sig_next))
            return traj  # [S, B, C, T, h, w]

        return run

    def collect_trajectory(self, embeds: np.ndarray,
                           sample_seed: int) -> np.ndarray:
        from fastvideo_tpu.pipelines.stages.latent_preparation import (
            randn_like_reference)

        neg = self.encode_text(self.negative_prompt)
        latents = jnp.asarray(
            randn_like_reference((1, *self.latent_shape), [sample_seed]))
        traj = self._run(self._params, latents,
                         jnp.asarray(embeds)[None], jnp.asarray(neg)[None])
        return np.asarray(traj[:, 0], dtype=np.float32)  # [S, C, T, h, w]

    def run(self, samples: Iterable[dict], output_dir: str,
            fps: float = 16.0) -> int:
        """samples: iterable of {"id", "caption"} (text-only records)."""
        os.makedirs(output_dir, exist_ok=True)
        tsteps = np.asarray(self.scheduler.timesteps, np.float32)
        records, total = [], 0
        for sample in samples:
            caption = sample.get("caption", "")
            if not caption.strip():
                continue
            embeds = self.encode_text(caption)
            traj = self.collect_trajectory(embeds, self.seed + total)
            records.append(
                record_from_ode_sample(str(sample.get("id", total)), embeds,
                                       traj, tsteps, caption=caption))
            total += 1
            if len(records) >= self.samples_per_file:
                write_parquet_dataset(records, output_dir,
                                      self.samples_per_file,
                                      schema=pyarrow_schema_ode())
                records = []
        if records:
            write_parquet_dataset(records, output_dir,
                                  self.samples_per_file,
                                  schema=pyarrow_schema_ode())
        logger.info("Collected %d ODE trajectories -> %s", total, output_dir)
        return total
