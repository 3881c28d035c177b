"""GameCraft denoising stage: camera/action-conditioned flow matching.

Analog of /root/reference/fastvideo/pipelines/stages/gamecraft_denoising.py
(:26-303): the model input is [latents(16) | gt_latents(16) | mask(1)]
(zeros when unconditioned), the CameraNet consumes Plücker camera states
each step, conditioned frames are re-injected with the clean reference
latent at EVERY step, and standard CFG (no embedded guidance) combines
positive/negative passes. Camera states may be given directly
(``camera_states``) or derived from a WASD ``action`` string via
:mod:`fastvideo_tpu.models.camera.trajectory`.
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


class GameCraftDenoisingStage(DenoisingStage):

    def _get_camera_step_fn(self):
        if "gc_main" in self._step_fns:
            return self._step_fns["gc_main"]
        graphdef, state = nnx.split(self.transformer)

        @functools.partial(jax.jit, static_argnames=())
        def step_fn(state, latents, ctx, t, camera_states=None):
            m = nnx.merge(graphdef, state)
            return m(latents, ctx, t, camera_states=camera_states)

        self._step_fns["gc_main"] = (step_fn, state)
        return self._step_fns["gc_main"]

    def _camera_states(self, batch: ForwardBatch, dtype):
        cam = batch.extra.get("camera_states")
        if cam is None and batch.extra.get("action"):
            from fastvideo_tpu.models.camera.trajectory import (
                create_camera_trajectory)

            cam = create_camera_trajectory(
                batch.extra["action"], height=batch.height,
                width=batch.width, num_frames=batch.num_frames,
                action_speed=float(batch.extra.get("action_speed", 0.2)),
                dtype=dtype)
        return jnp.asarray(cam, dtype) if cam is not None else None

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        target_dtype = jnp.bfloat16 if (
            self.pipeline_config is None
            or self.pipeline_config.precision == "bf16") else jnp.float32
        latents = batch.latents.astype(jnp.float32)

        pos_ctx = tuple(e.astype(target_dtype) for e in batch.prompt_embeds)
        neg_ctx = (tuple(
            e.astype(target_dtype) for e in batch.negative_prompt_embeds)
                   if batch.negative_prompt_embeds else None)
        do_cfg = batch.do_classifier_free_guidance and neg_ctx is not None
        guidance = batch.guidance_scale

        camera_states = self._camera_states(batch, target_dtype)
        gt_latents = batch.extra.get("gt_latents")
        cond_mask = batch.extra.get("conditioning_mask")
        gt_latents = (jnp.zeros_like(latents, target_dtype)
                      if gt_latents is None else jnp.asarray(
                          gt_latents, target_dtype))
        if cond_mask is None:
            cond_mask = jnp.zeros(
                (latents.shape[0], 1, *latents.shape[2:]), target_dtype)
        else:
            cond_mask = jnp.asarray(cond_mask, target_dtype)

        # clean-reference injection (reference :174-209): where the mask
        # flags a conditioned frame, force that latent frame to the clean
        # gt reference before every model call.
        cond_frames = None
        ref_latent = None
        import numpy as np

        mask_np = np.asarray(cond_mask[0, 0, :, 0, 0])
        if mask_np.sum() > 0 and np.abs(
                np.asarray(gt_latents[:, :, 0])).sum() > 0:
            cond_frames = [i for i in range(mask_np.shape[0])
                           if mask_np[i] > 0.5]
            ref_latent = gt_latents[:, :, 0].astype(jnp.float32)

        step_fn, state = self._get_camera_step_fn()
        timesteps = list(batch.timesteps)
        for i, t in enumerate(timesteps):
            if cond_frames:
                for fi in cond_frames:
                    latents = latents.at[:, :, fi].set(ref_latent)
            model_in = jnp.concatenate(
                [latents.astype(target_dtype), gt_latents, cond_mask],
                axis=1)
            t_arr = jnp.full((latents.shape[0],), float(t), jnp.float32)
            with set_forward_context(current_timestep=i,
                                     forward_batch=batch):
                noise_pred = step_fn(state, model_in, pos_ctx, t_arr,
                                     camera_states)
                if do_cfg:
                    noise_uncond = step_fn(state, model_in, neg_ctx, t_arr,
                                           camera_states)
                    noise_pred = noise_uncond + guidance * (noise_pred -
                                                            noise_uncond)
            latents = self.scheduler.step(
                noise_pred.astype(jnp.float32), t, latents).prev_sample
        batch.latents = latents
        return batch
