"""LongCat denoising stage: CFG-zero optimized guidance.

Analog of /root/reference/fastvideo/pipelines/stages/longcat_denoising.py
(:18-161): batched CFG (negative and positive prompts concatenated on
batch), the CFG-zero optimized scale
``st* = <v_cond, v_uncond> / ||v_uncond||^2`` applied as
``v_uncond*st* + g*(v_cond - v_uncond*st*)``, and the noise prediction
NEGATED before the flow-matching scheduler step (LongCat's velocity sign
convention). I2V/VC runs with ``num_cond_latents`` conditioning frames
that are re-imposed after every step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.forward_context import set_forward_context
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.stages.denoising import DenoisingStage

logger = init_logger(__name__)


def optimized_scale(positive: jax.Array, negative: jax.Array) -> jax.Array:
    """CFG-zero st* (reference longcat_denoising.py:28-47)."""
    b = positive.shape[0]
    pos = positive.reshape(b, -1).astype(jnp.float32)
    neg = negative.reshape(b, -1).astype(jnp.float32)
    dot = jnp.sum(pos * neg, axis=1, keepdims=True)
    sq = jnp.sum(neg * neg, axis=1, keepdims=True) + 1e-8
    return (dot / sq).reshape(b, 1, 1, 1, 1)


class LongCatDenoisingStage(DenoisingStage):

    def _get_lc_step_fn(self):
        if "lc_main" in self._step_fns:
            return self._step_fns["lc_main"]
        graphdef, state = nnx.split(self.transformer)

        @functools.partial(jax.jit, static_argnames=("num_cond_latents",))
        def step_fn(state, latents, ctx, t, mask=None,
                    num_cond_latents: int = 0):
            m = nnx.merge(graphdef, state)
            return m(latents, ctx, t, encoder_attention_mask=mask,
                     num_cond_latents=num_cond_latents)

        self._step_fns["lc_main"] = (step_fn, state)
        return self._step_fns["lc_main"]

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        target_dtype = jnp.bfloat16 if (
            self.pipeline_config is None
            or self.pipeline_config.precision == "bf16") else jnp.float32
        latents = batch.latents.astype(jnp.float32)
        guidance = batch.guidance_scale
        do_cfg = (batch.do_classifier_free_guidance
                  and bool(batch.negative_prompt_embeds))

        pos = batch.prompt_embeds[0].astype(target_dtype)
        pos_mask = (batch.prompt_attention_mask[0]
                    if batch.prompt_attention_mask else None)
        if do_cfg:
            neg = batch.negative_prompt_embeds[0].astype(target_dtype)
            neg_mask = (batch.negative_attention_mask[0]
                        if batch.negative_attention_mask else None)
            ctx = jnp.concatenate([neg, pos], axis=0)
            mask = (jnp.concatenate([neg_mask, pos_mask], axis=0)
                    if pos_mask is not None else None)
        else:
            ctx, mask = pos, pos_mask

        # I2V: conditioning latent frames stay FIXED; per-frame timesteps
        # mark them clean (reference longcat_i2v_denoising.py:95-145).
        num_cond = int(batch.extra.get("num_cond_latents", 0))

        step_fn, state = self._get_lc_step_fn()
        timesteps = list(batch.timesteps)
        nt = latents.shape[2]
        for i, t in enumerate(timesteps):
            model_in = (jnp.concatenate([latents] * 2)
                        if do_cfg else latents).astype(target_dtype)
            t_row = jnp.full((nt,), float(t), jnp.float32)
            if num_cond > 0:
                t_row = t_row.at[:num_cond].set(0.0)
            t_arr = jnp.broadcast_to(t_row, (model_in.shape[0], nt))
            with set_forward_context(current_timestep=i,
                                     forward_batch=batch):
                noise_pred = step_fn(state, model_in, ctx, t_arr, mask,
                                     num_cond_latents=num_cond)
            if do_cfg:
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
                st = optimized_scale(cond, uncond)
                noise_pred = (uncond.astype(jnp.float32) * st + guidance *
                              (cond.astype(jnp.float32) -
                               uncond.astype(jnp.float32) * st))
            # flow-matching sign convention (reference :152)
            noise_pred = -noise_pred.astype(jnp.float32)
            if num_cond > 0:
                stepped = self.scheduler.step(
                    noise_pred[:, :, num_cond:], t,
                    latents[:, :, num_cond:]).prev_sample
                latents = jnp.concatenate(
                    [latents[:, :, :num_cond], stepped], axis=2)
            else:
                latents = self.scheduler.step(noise_pred, t,
                                              latents).prev_sample
        batch.latents = latents
        return batch
