"""Super-resolution denoising stage (HunyuanVideo-1.5 SR pass).

Analog of /root/reference/fastvideo/pipelines/stages/sr_denoising.py
(:46-285): the low-res denoised latents are bilinearly resized to the SR
grid, refined by the latent upsampler (fp32), renoised at strength 0.7,
and concatenated as conditioning channels
``[latents(c) | video_latent(1) | zeros(c) | lq(c) | ones(1)]``.  Once
the schedule crosses ``t < 1000*strength`` the lq block (and its mask)
switches to zeros.  Runs on the SR expert (``transformer_2``) with the
SR flow shift and a fresh linspace sigma schedule.

TPU shape: both condition variants are precomputed on host (the switch
point is known from the host-side timestep list), so the jitted step
function stays static — the python loop only picks which condition array
to feed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.forward_context import set_forward_context
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.stages.denoising import DenoisingStage
from fastvideo_tpu.pipelines.stages.latent_preparation import (
    randn_like_reference)

logger = init_logger(__name__)


class Hy15SRDenoisingStage(DenoisingStage):
    """hy1.5 SR refinement loop (reference sr_denoising.py:46-285)."""

    def __init__(self, transformer, scheduler, upsampler,
                 pipeline_config=None):
        super().__init__(transformer, scheduler, pipeline_config)
        self.upsampler = upsampler

    def _add_noise_to_lq(self, lq: jax.Array, seeds,
                         strength: float = 0.7) -> jax.Array:
        """lerp toward fresh noise at t = 1000*strength (reference :73-82)."""
        noise = jnp.asarray(
            randn_like_reference(tuple(lq.shape),
                                 [s + 777 for s in (seeds or [0])]))
        return (1.0 - strength) * lq + strength * noise.astype(lq.dtype)

    def _build_conditions(self, batch: ForwardBatch, latents: jax.Array,
                          strength: float):
        """Precompute the (condition, zero-lq condition) pair."""
        lq = batch.lq_latents.astype(jnp.float32)
        b, c, f, h, w = lq.shape
        tgt_h, tgt_w = latents.shape[-2:]
        # bilinear (half-pixel, matching align_corners=False) resize in (h,w)
        lq = jax.image.resize(lq, (b, c, f, tgt_h, tgt_w), "bilinear")
        lq = self.upsampler(lq)  # fp32 refiner
        lq = self._add_noise_to_lq(lq, batch.seeds, strength)
        ones = jnp.ones((b, 1, f, tgt_h, tgt_w), lq.dtype)
        lq_cond = jnp.concatenate([lq, ones], axis=1)

        # I2V-style condition block ([cond(zc) | mask(1)], zeros for T2V) —
        # our framework's hy1.5 channel ordering; the reference packs the
        # same information mask-first (sr_denoising.py:166-172).
        cond = batch.image_latent
        if cond is None:
            cond = jnp.zeros((b, c + 1, f, tgt_h, tgt_w), jnp.float32)
        cond = cond.astype(jnp.float32)
        condition = jnp.concatenate([cond, lq_cond], axis=1)
        zero_lq = jnp.concatenate(
            [cond, jnp.zeros_like(lq_cond)], axis=1)
        return condition, zero_lq

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        cfg = self.pipeline_config
        target_dtype = jnp.bfloat16 if (cfg is None or cfg.precision
                                        == "bf16") else jnp.float32
        strength = 0.7

        # SR schedule: fresh linspace sigmas under the SR shift
        # (reference :120-127). The base shift is restored afterwards so a
        # subsequent generate call re-prepares its schedule cleanly.
        base_shift = self.scheduler.shift
        self.scheduler.set_shift(
            getattr(cfg, "flow_shift_sr", 2.0) if cfg is not None else 2.0)
        steps = batch.num_inference_steps_sr
        sigmas = np.linspace(1.0, 0.0, steps + 1)[:-1]
        self.scheduler.set_timesteps(sigmas=sigmas)
        timesteps = list(self.scheduler.timesteps)

        latents = batch.latents.astype(jnp.float32)
        condition, zero_lq_condition = self._build_conditions(
            batch, latents, strength)
        condition = condition.astype(target_dtype)
        zero_lq_condition = zero_lq_condition.astype(target_dtype)

        def _ctx(embeds):
            if len(embeds) > 1:
                return tuple(e.astype(target_dtype) for e in embeds)
            return embeds[0].astype(target_dtype)

        pos_ctx = _ctx(batch.prompt_embeds)
        image_embeds = (batch.image_embeds[0].astype(target_dtype)
                        if batch.image_embeds else None)
        guidance_arr = None
        if cfg is not None and cfg.embedded_cfg_scale is not None:
            guidance_arr = jnp.full((latents.shape[0],),
                                    float(cfg.embedded_cfg_scale) * 1000.0,
                                    jnp.float32)

        step_fn, state = self._get_step_fn("main")
        for i, t in enumerate(timesteps):
            cond = zero_lq_condition if float(t) < 1000.0 * strength \
                else condition
            model_in = jnp.concatenate(
                [latents.astype(target_dtype), cond], axis=1)
            t_arr = jnp.full((latents.shape[0],), float(t), jnp.float32)
            # meanflow companion timestep: the NEXT t (0 on the last step,
            # reference :193-197)
            t_next = float(timesteps[i + 1]) if i < len(timesteps) - 1 \
                else 0.0
            tr_arr = jnp.full((latents.shape[0],), t_next, jnp.float32)
            with set_forward_context(current_timestep=i, forward_batch=batch):
                noise_pred = step_fn(state, model_in, pos_ctx, t_arr,
                                     image_embeds,
                                     image_cond=image_embeds is not None,
                                     guidance=guidance_arr,
                                     timestep_r=tr_arr)
            latents = self.scheduler.step(
                noise_pred.astype(jnp.float32), t, latents).prev_sample
        self.scheduler.set_shift(base_shift)
        batch.latents = latents
        return batch
