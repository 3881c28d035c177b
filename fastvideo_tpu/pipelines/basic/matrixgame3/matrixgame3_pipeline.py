"""Matrix-Game 3.0 I2V pipeline: action-conditioned streaming world model.

Behavioral reference: /root/reference/fastvideo/pipelines/basic/matrixgame3/
matrixgame3_i2v_pipeline.py + pipelines/stages/matrixgame3_denoising.py
(:27-328): generation proceeds in 57-frame clips (15 latent frames, 4x
temporal VAE); each clip denoises fresh noise whose first 1 (first clip) or
4 (later clips) latent frames are pinned to the conditioning latents;
keyboard/mouse actions integrate into a camera trajectory whose Plücker
embeddings modulate the DiT; later clips attend to FOV-selected memory
frames from the full history with their own relative-pose Plückers.

TPU shape: all trajectory/memory math is host numpy; each distinct
(memory count) clip shape compiles one jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.forward_context import set_forward_context
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.models.schedulers.flow_unipc import (
    FlowUniPCMultistepScheduler)
from fastvideo_tpu.pipelines.basic.matrixgame3 import camera as mg3cam
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.composed import ComposedPipelineBase
from fastvideo_tpu.pipelines.lora_pipeline import LoRAPipelineMixin
from fastvideo_tpu.pipelines.stages.base import PipelineStage
from fastvideo_tpu.pipelines.stages.decoding import DecodingStage
from fastvideo_tpu.pipelines.stages.input_validation import (
    InputValidationStage)
from fastvideo_tpu.pipelines.stages.latent_preparation import (
    LatentPreparationStage, randn_like_reference)
from fastvideo_tpu.pipelines.stages.text_encoding import TextEncodingStage

logger = init_logger(__name__)

CLIP_FRAME = 56
FIRST_CLIP_FRAME = CLIP_FRAME + 1
PAST_FRAME = 16


def _get_latent_idx(frame_idx: int) -> int:
    return (frame_idx - 1) // 4 + 1


def _align_frame_to_block(frame_idx: int) -> int:
    return (frame_idx - 1) // 4 * 4 + 1 if frame_idx > 0 else 1


class MatrixGame3ImageVAEEncodingStage(PipelineStage):
    """First-frame VAE latent (reference stages/image_encoding.py:869-964)."""

    def __init__(self, vae):
        self.vae = vae

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        assert batch.pil_image is not None, "Matrix-Game 3 requires an image"
        img = np.asarray(batch.pil_image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 127.5 - 1.0
        if img.ndim == 3:
            img = img.transpose(2, 0, 1)[None, :, None]  # [1,3,1,H,W]
        # resize to target canvas (host nearest)
        h, w = batch.height, batch.width
        if img.shape[-2:] != (h, w):
            ih = (np.arange(h) * img.shape[-2] / h).astype(int)
            iw = (np.arange(w) * img.shape[-1] / w).astype(int)
            img = img[..., ih, :][..., iw]
        posterior = self.vae.encode(jnp.asarray(img, jnp.float32))
        img_cond = posterior.mean
        img_cond = jnp.transpose(img_cond, (0, 4, 1, 2, 3))  # NDHWC->NCDHW
        img_cond = self.vae.normalize_latents(img_cond)
        batch.image_latent = img_cond.astype(jnp.float32)
        return batch


class MatrixGame3DenoisingStage(PipelineStage):
    """Reference pipelines/stages/matrixgame3_denoising.py:27-328."""

    def __init__(self, transformer, scheduler, pipeline_config):
        self.transformer = transformer
        self.scheduler = scheduler
        self.pipeline_config = pipeline_config
        self._step = None

    def _get_step(self):
        if self._step is None:
            from functools import partial

            from flax import nnx

            graphdef, state = nnx.split(self.transformer)

            @partial(jax.jit,
                     static_argnames=("memory_latent_idx",
                                      "predict_latent_idx"))
            def step_fn(state, latents, ctx, t_tokens, mouse, keyboard,
                        plucker, x_memory=None, timestep_memory=None,
                        mouse_memory=None, keyboard_memory=None,
                        memory_latent_idx=None, predict_latent_idx=None):
                m = nnx.merge(graphdef, state)
                return m(latents, ctx, t_tokens, mouse_cond=mouse,
                         keyboard_cond=keyboard,
                         x_memory=x_memory,
                         timestep_memory=timestep_memory,
                         mouse_cond_memory=mouse_memory,
                         keyboard_cond_memory=keyboard_memory,
                         c2ws_plucker_emb=plucker,
                         memory_latent_idx=memory_latent_idx,
                         predict_latent_idx=predict_latent_idx)

            self._step = (step_fn, state)
        return self._step

    def _infer_num_iterations(self, batch: ForwardBatch) -> int:
        n = batch.extra.get("num_iterations")
        if n is not None:
            return int(n)
        if isinstance(batch.num_frames, int) and batch.num_frames > 57:
            return 1 + max(0, (batch.num_frames - 57 + 39) // 40)
        return 1

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        assert batch.latents is not None and batch.image_latent is not None
        step_fn, state = self._get_step()
        dtype = jnp.bfloat16
        latents = batch.latents
        img_cond = batch.image_latent.astype(jnp.float32)
        latent_h, latent_w = latents.shape[-2], latents.shape[-1]
        patch = getattr(self.transformer, "patch_size", (1, 2, 2))
        latent_h = latent_h // patch[1] * patch[1]
        latent_w = latent_w // patch[2] * patch[2]
        img_cond = img_cond[:, :, :, :latent_h, :latent_w]
        spatial_ratio = (self.pipeline_config.vae_config.arch_config.
                         scale_factor_spatial)
        target_h = latent_h * spatial_ratio
        target_w = latent_w * spatial_ratio
        num_iterations = self._infer_num_iterations(batch)
        total_video_frames = FIRST_CLIP_FRAME + max(
            0, num_iterations - 1) * (CLIP_FRAME - PAST_FRAME)

        keyboard = batch.extra.get("keyboard_cond")
        mouse = batch.extra.get("mouse_cond")
        if keyboard is None or mouse is None:
            keyboard, mouse = mg3cam.build_matrixgame3_action_preset(
                total_video_frames, seed=batch.seed)
            keyboard = keyboard[None]
            mouse = mouse[None]
        keyboard = np.asarray(keyboard, np.float32)
        mouse = np.asarray(mouse, np.float32)
        if keyboard.ndim == 2:
            keyboard = keyboard[None]
        if mouse.ndim == 2:
            mouse = mouse[None]
        assert keyboard.shape[0] == 1, \
            "Matrix-Game 3 requires batch_size=1 action streams"
        extrinsics_all = mg3cam.build_extrinsics_from_actions(
            keyboard[0], mouse[0])

        all_latents: list[jax.Array] = []
        x_memory = None
        for clip_idx in range(num_iterations):
            self.scheduler.set_timesteps(batch.num_inference_steps)
            timesteps = list(self.scheduler.timesteps)

            first_clip = clip_idx == 0
            end_f = (FIRST_CLIP_FRAME if first_clip else FIRST_CLIP_FRAME +
                     clip_idx * (CLIP_FRAME - PAST_FRAME))
            start_f = 0 if first_clip else end_f - CLIP_FRAME
            current_latent_frames = ((FIRST_CLIP_FRAME - 1) // 4 +
                                     1 if first_clip else CLIP_FRAME // 4)
            cond_frames = 1 if first_clip else 4
            latent_start = _get_latent_idx(start_f)
            latent_end = _get_latent_idx(end_f)

            clip_keyboard = jnp.asarray(keyboard[:, start_f:end_f], dtype)
            clip_mouse = jnp.asarray(mouse[:, start_f:end_f], dtype)
            cond_frames = min(cond_frames, img_cond.shape[2])
            noise = randn_like_reference(
                (1, latents.shape[1], latent_end - latent_start, latent_h,
                 latent_w), [(batch.seed or 0) + clip_idx])
            current = jnp.asarray(noise, jnp.float32)
            current = current.at[:, :, :cond_frames].set(
                img_cond[:, :, :cond_frames])

            c2ws_chunk = extrinsics_all[start_f:end_f]
            src_idx = np.linspace(start_f, end_f - 1, end_f - start_f)
            tgt_idx = np.linspace(0 if first_clip else start_f + 3,
                                  end_f - 1, current_latent_frames)
            plucker_no_mem = mg3cam.build_plucker_from_c2ws(
                c2ws_chunk, src_idx, tgt_idx, target_h=target_h,
                target_w=target_w, latent_h=latent_h, latent_w=latent_w,
                framewise=True)
            plucker_no_mem = jnp.asarray(plucker_no_mem, dtype)

            timestep_memory = None
            mouse_memory = None
            keyboard_memory = None
            memory_latent_idx = None
            plucker = plucker_no_mem
            x_mem_arr = None
            if all_latents:
                base = [end_f - off for off in range(1, 34, 8)]
                selected = mg3cam.select_memory_idx_fov(
                    extrinsics_all, start_f, base, height=target_h,
                    width=target_w)
                if selected:
                    selected[-1] = 4
                memory_pluckers = []
                memory_latent_idx = []
                for mem_idx, ref_idx in zip(selected, base):
                    memory_latent_idx.append(_get_latent_idx(mem_idx))
                    mia = _align_frame_to_block(mem_idx)
                    block = extrinsics_all[mia:mia + 4]
                    mem_src = np.linspace(mia, mia + block.shape[0] - 1,
                                          block.shape[0])
                    mem_tgt = np.array([mia + 3], np.float32)
                    mem_pose = mg3cam.interpolate_camera_poses_handedness(
                        mem_src, block[:, :3, :3], block[:, :3, 3], mem_tgt)
                    ref_pose = extrinsics_all[ref_idx:ref_idx + 1]
                    rel = mg3cam.compute_relative_poses(
                        np.concatenate([ref_pose, mem_pose]),
                        framewise=False)[1:2]
                    memory_pluckers.append(
                        mg3cam.build_plucker_from_pose(
                            rel, target_h=target_h, target_w=target_w,
                            latent_h=latent_h, latent_w=latent_w))
                plucker = jnp.asarray(
                    np.concatenate(memory_pluckers +
                                   [np.asarray(plucker_no_mem,
                                               np.float32)], axis=2), dtype)
                history = jnp.concatenate(all_latents, axis=2)
                x_mem_arr = history[:, :, jnp.asarray(memory_latent_idx)]
                n_mem = len(memory_latent_idx)
                mouse_memory = jnp.ones((1, n_mem, clip_mouse.shape[-1]),
                                        dtype)
                keyboard_memory = -jnp.ones(
                    (1, n_mem, clip_keyboard.shape[-1]), dtype)
                timestep_memory = jnp.zeros(
                    (1, n_mem * latent_h * latent_w // 4), jnp.float32)
                memory_latent_idx = tuple(memory_latent_idx)

            tokens_per_frame = latent_h * latent_w // 4
            n_lat = latent_end - latent_start
            for i, t in enumerate(timesteps):
                t_tokens = np.full((n_lat, tokens_per_frame), float(t),
                                   np.float32)
                t_tokens[:cond_frames] = 0.0
                t_tokens = jnp.asarray(t_tokens.reshape(1, -1))
                with set_forward_context(current_timestep=i,
                                         forward_batch=batch):
                    pred = step_fn(
                        state, current.astype(dtype),
                        batch.prompt_embeds[0].astype(dtype), t_tokens,
                        clip_mouse, clip_keyboard, plucker,
                        x_memory=(None if x_mem_arr is None else
                                  x_mem_arr.astype(dtype)),
                        timestep_memory=timestep_memory,
                        mouse_memory=mouse_memory,
                        keyboard_memory=keyboard_memory,
                        memory_latent_idx=memory_latent_idx,
                        predict_latent_idx=(latent_start, latent_end))
                    pred = pred.astype(jnp.float32)
                    if (batch.do_classifier_free_guidance
                            and batch.negative_prompt_embeds):
                        uncond = step_fn(
                            state, current.astype(dtype),
                            batch.negative_prompt_embeds[0].astype(dtype),
                            t_tokens, jnp.ones_like(clip_mouse),
                            -jnp.ones_like(clip_keyboard), plucker_no_mem,
                            predict_latent_idx=(latent_start,
                                                latent_end)).astype(
                                                    jnp.float32)
                        pred = uncond + batch.guidance_scale * (pred -
                                                                uncond)
                current = self.scheduler.step(pred, t, current).prev_sample
                current = current.at[:, :, :cond_frames].set(
                    img_cond[:, :, :cond_frames])

            img_cond = current[:, :, -4:]
            denoised = current if first_clip else current[:, :, -10:]
            all_latents.append(denoised)

        batch.latents = jnp.concatenate(all_latents, axis=2)
        return batch


class MatrixGame3I2VPipeline(ComposedPipelineBase, LoRAPipelineMixin):
    _required_config_modules = [
        "vae", "transformer", "scheduler", "text_encoder", "tokenizer"
    ]
    _extra_config_module_map = {"vae": "light_vae"}

    def initialize_pipeline(self, fastvideo_args: FastVideoArgs) -> None:
        self.modules["scheduler"] = FlowUniPCMultistepScheduler(
            shift=self.pipeline_config.flow_shift or 5.0)

    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        cfg = self.pipeline_config
        self.add_stage("input_validation_stage", InputValidationStage())
        self.add_stage(
            "prompt_encoding_stage",
            TextEncodingStage(
                text_encoders=[self.get_module("text_encoder")],
                tokenizers=[self.get_module("tokenizer")],
                postprocess_funcs=cfg.postprocess_text_funcs,
            ))
        self.add_stage("latent_preparation_stage",
                       LatentPreparationStage(self.get_module("scheduler"),
                                              self.get_module("transformer"),
                                              cfg.vae_config))
        self.add_stage("image_latent_preparation_stage",
                       MatrixGame3ImageVAEEncodingStage(
                           self.get_module("vae")))
        self.add_stage(
            "denoising_stage",
            MatrixGame3DenoisingStage(self.get_module("transformer"),
                                      self.get_module("scheduler"), cfg))
        self.add_stage("decoding_stage",
                       DecodingStage(self.get_module("vae"), cfg))


EntryClass = MatrixGame3I2VPipeline
