"""HYWorld (HY-WorldPlay) chunk-based camera/action world-model pipeline.

Behavioral reference: /root/reference/fastvideo/pipelines/basic/hyworld/
hyworld_pipeline.py + pipelines/stages/hyworld_denoising.py (:27-411):
the hy1.5 trunk generates video in ``chunk_latent_frames`` chunks; later
chunks prepend FOV-aligned context frames held nearly clean at the
stabilization timestep; per-frame timesteps, PRoPE camera matrices
(viewmats, Ks) and per-frame action labels condition every DiT call; the
conditioning image rides the hy1.5 [z+1]-channel cond-latent block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.forward_context import set_forward_context
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.pipelines.basic.hunyuan15.hunyuan15_pipeline import (
    HunyuanVideo15Pipeline)
from fastvideo_tpu.pipelines.basic.hyworld import pose as hyp
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.stages.base import PipelineStage

logger = init_logger(__name__)

STABILIZATION_LEVEL = 15


class HYWorldDenoisingStage(PipelineStage):
    """Chunked bi_rollout denoising (reference hyworld_denoising.py)."""

    def __init__(self, transformer, scheduler, pipeline_config):
        self.transformer = transformer
        self.scheduler = scheduler
        self.pipeline_config = pipeline_config
        self._step = None

    def _get_step(self):
        if self._step is None:
            from flax import nnx

            graphdef, state = nnx.split(self.transformer)

            @jax.jit
            def step_fn(state, latents, ctx, ctx2, t_frames, t_txt,
                        image_embeds, viewmats, ks, action):
                m = nnx.merge(graphdef, state)
                return m(latents, (ctx, ctx2), t_frames,
                         encoder_hidden_states_image=image_embeds,
                         viewmats=viewmats, Ks=ks, action=action,
                         timestep_txt=t_txt)

            self._step = (step_fn, state)
        return self._step

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        assert batch.latents is not None and batch.image_latent is not None
        dtype = jnp.bfloat16
        step_fn, state = self._get_step()

        viewmats = batch.extra.get("viewmats")
        ks = batch.extra.get("Ks")
        action = batch.extra.get("action")
        chunk_latent = int(batch.extra.get("chunk_latent_frames", 16))
        if viewmats is None or ks is None or action is None:
            pose_str = batch.extra.get("pose")
            if pose_str is None:
                raise ValueError(
                    "HYWorld needs a pose string (extra['pose']) or "
                    "(viewmats, Ks, action) in extra")
            # latent count follows the actual prepared latents (the
            # reference hardcodes the 4x production VAE ratio)
            latent_num = (int(batch.latents.shape[2])
                          if batch.latents is not None else
                          hyp.compute_latent_num(int(batch.num_frames)))
            viewmats, ks, action = hyp.pose_to_input(pose_str, latent_num)
            viewmats = viewmats[None]
            ks = ks[None]
            action = action[None]
        viewmats = np.asarray(viewmats, np.float32)
        ks = np.asarray(ks, np.float32)
        action = np.asarray(action, np.float32)

        points_local = hyp.generate_points_in_sphere(50000, 8.0)

        latents = batch.latents.astype(jnp.float32)
        cond_latents = batch.image_latent.astype(jnp.float32)
        latent_frames = latents.shape[2]
        chunk_num = max(1, latent_frames // chunk_latent)
        chunk_latent = min(chunk_latent, latent_frames)

        pos_ctx = [e.astype(dtype) for e in batch.prompt_embeds]
        neg_ctx = ([e.astype(dtype) for e in batch.negative_prompt_embeds]
                   if (batch.do_classifier_free_guidance
                       and batch.negative_prompt_embeds) else None)
        image_embeds = (batch.image_embeds[0].astype(dtype)
                        if batch.image_embeds else None)

        for chunk_i in range(chunk_num):
            start = chunk_i * chunk_latent
            end = start + chunk_latent
            selected: list[int] = []
            if chunk_i > 0:
                for cs in range(start, end, 4):
                    selected.extend(
                        hyp.select_aligned_memory_frames(
                            viewmats[0], cs, memory_frames=20,
                            temporal_context_size=12, pred_latent_size=4,
                            points_local=points_local))
                selected = sorted(set(selected) -
                                  set(range(start, end)))

            self.scheduler.set_timesteps(batch.num_inference_steps)
            timesteps = list(self.scheduler.timesteps)
            n_ctx = len(selected)
            sel = jnp.asarray(selected, jnp.int32) if selected else None
            vm_chunk = viewmats[:, start:end]
            ks_chunk = ks[:, start:end]
            act_chunk = action[:, start:end]
            if selected:
                vm_chunk = np.concatenate([viewmats[:, selected], vm_chunk],
                                          axis=1)
                ks_chunk = np.concatenate([ks[:, selected], ks_chunk],
                                          axis=1)
                act_chunk = np.concatenate([action[:, selected], act_chunk],
                                           axis=1)

            model_latents = latents[:, :, start:end]
            for i, t in enumerate(timesteps):
                t_now = np.full((chunk_latent,), float(t), np.float32)
                if selected:
                    t_ctx = np.full((n_ctx,), STABILIZATION_LEVEL - 1,
                                    np.float32)
                    t_frames = np.concatenate([t_ctx, t_now])
                    model_in = jnp.concatenate(
                        [latents[:, :, sel], model_latents], axis=2)
                else:
                    t_frames = t_now
                    model_in = model_latents
                cond_in = cond_latents[:, :, :model_in.shape[2]]
                latents_concat = jnp.concatenate(
                    [model_in, cond_in], axis=1).astype(dtype)
                t_frames_j = jnp.asarray(t_frames)[None]
                t_txt = jnp.asarray([float(t)], jnp.float32)
                with set_forward_context(current_timestep=i,
                                         forward_batch=batch):
                    pred = step_fn(state, latents_concat, pos_ctx[0],
                                   pos_ctx[1] if len(pos_ctx) > 1 else None,
                                   t_frames_j, t_txt, image_embeds,
                                   jnp.asarray(vm_chunk, dtype),
                                   jnp.asarray(ks_chunk, dtype),
                                   jnp.asarray(act_chunk.reshape(-1),
                                               dtype)).astype(jnp.float32)
                    if neg_ctx is not None:
                        uncond = step_fn(
                            state, latents_concat, neg_ctx[0],
                            neg_ctx[1] if len(neg_ctx) > 1 else None,
                            t_frames_j, t_txt, image_embeds,
                            jnp.asarray(vm_chunk, dtype),
                            jnp.asarray(ks_chunk, dtype),
                            jnp.asarray(act_chunk.reshape(-1),
                                        dtype)).astype(jnp.float32)
                        pred = uncond + batch.guidance_scale * (pred -
                                                                uncond)
                stepped = self.scheduler.step(
                    pred, t, model_in.astype(jnp.float32)).prev_sample
                model_latents = stepped[:, :, -chunk_latent:]
                latents = latents.at[:, :, start:end].set(model_latents)

        batch.latents = latents
        return batch


class HYWorldPipeline(HunyuanVideo15Pipeline):
    """Chunk-based 3D-aware generation on the hy1.5 trunk."""

    _required_config_modules = [
        "text_encoder", "text_encoder_2", "tokenizer", "tokenizer_2",
        "vae", "transformer", "scheduler", "image_encoder"
    ]

    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        super().create_pipeline_stages(fastvideo_args)
        denoise = HYWorldDenoisingStage(self.get_module("transformer"),
                                        self.get_module("scheduler"),
                                        self.pipeline_config)
        self._stages[self._stages.index(self.denoising_stage)] = denoise
        self.denoising_stage = denoise
        self._stage_name_mapping["denoising_stage"] = denoise


EntryClass = HYWorldPipeline
