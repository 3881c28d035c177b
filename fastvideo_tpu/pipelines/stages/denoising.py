"""Denoising stage — the hot loop.

Analog of /root/reference/fastvideo/pipelines/stages/denoising.py:48-744.
Per step: (optional Wan2.2 dual-expert select by boundary timestep) ->
transformer forward (jitted; Ulysses SP inside) -> CFG combine ->
scheduler.step in fp32. The transformer step is a single XLA program per
(shape, expert); the python loop only orchestrates steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu import envs
from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.forward_context import set_forward_context
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.stages.base import PipelineStage

logger = init_logger(__name__)


class DenoisingStage(PipelineStage):
    def __init__(self, transformer, scheduler, pipeline_config=None,
                 transformer_2=None, vae=None):
        self.transformer = transformer
        self.transformer_2 = transformer_2
        self.scheduler = scheduler
        self.pipeline_config = pipeline_config
        self.vae = vae  # TI2V first-frame encode (reference :264)
        self._step_fns = {}

    # -- Wan2.2 TI2V: first-frame latent replacement ------------------------

    def _ti2v_encode_first_frame(self, batch: ForwardBatch):
        """Encode the conditioning image into one normalized latent frame
        (reference stages/denoising.py:259-292): TI2V REPLACES latent
        frame 0 instead of concatenating channels."""
        import numpy as np

        assert batch.image_latent is None, \
            "TI2V task must not carry channel-concat image latents"
        assert self.vae is not None, "TI2V requires the VAE in DenoisingStage"
        img = np.asarray(batch.pil_image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 127.5 - 1.0
        if img.ndim == 3:  # [H, W, 3] -> [1, 3, 1, H, W]
            img = img.transpose(2, 0, 1)[None, :, None]
        z = self.vae.encode(jnp.asarray(img, jnp.float32)).mean
        z = jnp.transpose(z, (0, 4, 1, 2, 3))  # NDHWC -> NCDHW
        return self.vae.normalize_latents(z).astype(jnp.float32)

    def _ti2v_timesteps(self, t: float, latents) -> jax.Array:
        """Per-token timesteps: 0 for the conditioned frame-0 tokens
        (reference stages/denoising.py:424-429 mask2 * t flatten)."""
        b, _, tt, h, w = latents.shape
        ps = self.pipeline_config.dit_config.arch_config.patch_size
        tokens_per_frame = (h // ps[1]) * (w // ps[2])
        seq_len = (tt // ps[0]) * tokens_per_frame
        ts = jnp.full((seq_len,), float(t), jnp.float32)
        ts = ts.at[:tokens_per_frame].set(0.0)
        return jnp.broadcast_to(ts, (b, seq_len))

    @staticmethod
    def _ti2v_blend(latents, z):
        """(1 - mask2) * z + mask2 * latents with mask2 zero at frame 0."""
        return jnp.concatenate(
            [z.astype(latents.dtype), latents[:, :, 1:]], axis=2)

    def _get_step_fn(self, which: str):
        """Jitted pure forward for one expert; cached per expert."""
        if which in self._step_fns:
            return self._step_fns[which]
        model = self.transformer if which == "main" else self.transformer_2
        graphdef, state = nnx.split(model)

        @functools.partial(jax.jit, static_argnames=("image_cond",))
        def step_fn(state, latents, ctx, t, image_embeds=None,
                    image_cond: bool = False, guidance=None,
                    timestep_r=None, viewmats=None, intrinsics=None,
                    c2ws_plucker=None, mouse=None, keyboard=None):
            m = nnx.merge(graphdef, state)
            kwargs = {}
            if guidance is not None:
                # Hunyuan-style distilled embedded guidance
                kwargs["guidance"] = guidance
            if timestep_r is not None:
                # meanflow next-step timestep (hy1.5 SR / step-distilled)
                kwargs["timestep_r"] = timestep_r
            if viewmats is not None:
                # PRoPE camera conditioning (DreamX-World-5B-Cam)
                kwargs["y_camera"] = {"viewmats": viewmats,
                                      "K": intrinsics}
            if c2ws_plucker is not None:
                # Plücker-ray FiLM conditioning (LingBot-World)
                kwargs["c2ws_plucker_emb"] = c2ws_plucker
            if mouse is not None or keyboard is not None:
                # Matrix-Game mouse/keyboard action attention
                kwargs["mouse_cond"] = mouse
                kwargs["keyboard_cond"] = keyboard
            return m(latents, ctx, t,
                     encoder_hidden_states_image=(image_embeds
                                                  if image_cond else None),
                     **kwargs)

        self._step_fns[which] = (step_fn, state)
        return self._step_fns[which]

    def _select_expert(self, t: float, batch: ForwardBatch) -> str:
        boundary_ratio = None
        if self.pipeline_config is not None:
            boundary_ratio = self.pipeline_config.boundary_ratio
        if boundary_ratio is None or self.transformer_2 is None:
            return "main"
        boundary_timestep = boundary_ratio * \
            self.scheduler.num_train_timesteps
        # reference: high-noise expert above the boundary
        # (stages/denoising.py:377-401)
        return "main" if t >= boundary_timestep else "second"

    def _build_attn_metadata(self, batch: ForwardBatch,
                             fastvideo_args: FastVideoArgs):
        """Per-step sparse-attention metadata (reference
        stages/denoising.py:469-500): currently the VSA sparsity knob."""
        sparsity = batch.VSA_sparsity or fastvideo_args.VSA_sparsity
        if not sparsity:
            return None
        from fastvideo_tpu.attention.backends.abstract import (
            AttentionMetadata)

        return AttentionMetadata(extra={"VSA_sparsity": float(sparsity)})

    def _model_input(self, batch: ForwardBatch, latents):
        if batch.video_latent is not None:
            # V2V / Lucy Edit: control latent on channels (reference
            # stages/denoising.py:405-415). Lucy concatenates [noise |
            # video]; Wan V2V additionally zero-pads a third latent-width
            # block.
            if self._is_lucy():
                return jnp.concatenate(
                    [latents,
                     batch.video_latent.astype(latents.dtype)], axis=1)
            return jnp.concatenate(
                [latents,
                 batch.video_latent.astype(latents.dtype),
                 jnp.zeros_like(latents)], axis=1)
        if batch.image_latent is not None:
            # I2V: concat conditioning latent on channels
            # (reference stages/denoising.py:404-419).
            return jnp.concatenate(
                [latents, batch.image_latent.astype(latents.dtype)], axis=1)
        return latents

    def _is_lucy(self) -> bool:
        return (self.pipeline_config is not None
                and getattr(self.pipeline_config, "lucy_edit_task", False))

    def _expanded_timesteps(self, t: float, latents) -> jax.Array:
        """Uniform per-token timesteps [B, seq_len] for expand_timesteps
        models (Lucy Edit / Wan2.2 5B; reference denoising.py:421-423)."""
        b, _, tt, h, w = latents.shape
        ps = self.pipeline_config.dit_config.arch_config.patch_size
        seq_len = (tt // ps[0]) * (h // ps[1]) * (w // ps[2])
        return jnp.full((b, seq_len), float(t), jnp.float32)

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        target_dtype = jnp.bfloat16 if (
            self.pipeline_config is None
            or self.pipeline_config.precision == "bf16") else jnp.float32
        latents = batch.latents

        def _ctx(embeds):
            # multi-encoder families (Hunyuan: LLaMA seq + CLIP pooled)
            # pass the full tuple; single-encoder families the one array.
            if len(embeds) > 1:
                return tuple(e.astype(target_dtype) for e in embeds)
            return embeds[0].astype(target_dtype)

        pos_ctx = _ctx(batch.prompt_embeds)
        neg_ctx = (_ctx(batch.negative_prompt_embeds)
                   if batch.negative_prompt_embeds else None)
        image_embeds = (batch.image_embeds[0].astype(target_dtype)
                        if batch.image_embeds else None)
        guidance = batch.guidance_scale
        do_cfg = batch.do_classifier_free_guidance and neg_ctx is not None

        timesteps = list(batch.timesteps)
        trajectory = []
        guidance_arr = None
        use_embedded = batch.extra.get("use_embedded_guidance")
        if use_embedded is not True and use_embedded is not False:
            use_embedded = (self.pipeline_config is not None and
                            self.pipeline_config.embedded_cfg_scale
                            is not None)
        if use_embedded:
            # distilled embedded guidance (reference denoising.py guidance
            # = embedded_cfg_scale * 1000); per-request override falls
            # back to guidance_scale when the config has no scale
            scale = (self.pipeline_config.embedded_cfg_scale
                     if self.pipeline_config is not None
                     and self.pipeline_config.embedded_cfg_scale is not None
                     else batch.guidance_scale)
            guidance_arr = jnp.full(
                (latents.shape[0],), float(scale) * 1000.0, jnp.float32)
        attn_metadata = self._build_attn_metadata(batch, fastvideo_args)
        if batch.extra.get("enable_teacache") and \
                "cfg_cache_interval" not in batch.extra:
            # TeaCache maps onto the TeaCache-style delta-CFG cache
            # (reference stages/denoising.py:331-363): reuse the CFG
            # delta on alternating steps
            batch.extra["cfg_cache_interval"] = 2
        cfg_cache_interval = int(batch.extra.get("cfg_cache_interval", 1))
        cfg_delta = None
        y_cam = batch.extra.get("y_camera")
        cam_kw = ({} if y_cam is None else
                  dict(viewmats=jnp.asarray(y_cam["viewmats"], jnp.float32),
                       intrinsics=jnp.asarray(y_cam["K"], jnp.float32)))
        plucker = batch.extra.get("c2ws_plucker_emb")
        if plucker is not None:
            cam_kw["c2ws_plucker"] = jnp.asarray(plucker, jnp.float32)
        if batch.extra.get("mouse_cond") is not None:
            cam_kw["mouse"] = jnp.asarray(batch.extra["mouse_cond"],
                                          jnp.float32)
        if batch.extra.get("keyboard_cond") is not None:
            cam_kw["keyboard"] = jnp.asarray(batch.extra["keyboard_cond"],
                                             jnp.float32)
        ti2v = (self.pipeline_config is not None
                and getattr(self.pipeline_config, "ti2v_task", False)
                and batch.pil_image is not None)
        ti2v_z = None
        if ti2v:
            ti2v_z = self._ti2v_encode_first_frame(batch)
            latents = self._ti2v_blend(latents.astype(jnp.float32), ti2v_z)
        for i, t in enumerate(timesteps):
            which = self._select_expert(float(t), batch)
            step_fn, state = self._get_step_fn(which)
            if ti2v:
                t_arr = self._ti2v_timesteps(float(t), latents)
            elif self._is_lucy():
                t_arr = self._expanded_timesteps(float(t), latents)
            else:
                t_arr = jnp.full((latents.shape[0],), float(t), jnp.float32)
            model_in = self._model_input(batch, latents.astype(target_dtype))
            if attn_metadata is not None:
                attn_metadata.current_timestep = i
            with set_forward_context(current_timestep=i,
                                     attn_metadata=attn_metadata,
                                     forward_batch=batch):
                noise_pred = step_fn(state, model_in, pos_ctx, t_arr,
                                     image_embeds,
                                     image_cond=image_embeds is not None,
                                     guidance=guidance_arr, **cam_kw)
                if do_cfg:
                    # TeaCache-style delta caching (reference
                    # stages/denoising.py:338,527-581): recompute the uncond
                    # pass only every `cfg_cache_interval` steps (and on the
                    # final step); in between reuse the cached
                    # (cond - uncond) delta, halving model calls.
                    recompute = (cfg_cache_interval <= 1
                                 or i % cfg_cache_interval == 0
                                 or i == len(timesteps) - 1
                                 or cfg_delta is None)
                    noise_text = noise_pred
                    if recompute:
                        noise_uncond = step_fn(state, model_in, neg_ctx,
                                               t_arr, image_embeds,
                                               image_cond=image_embeds
                                               is not None,
                                               guidance=guidance_arr,
                                               **cam_kw)
                        cfg_delta = noise_pred - noise_uncond
                        noise_pred = noise_uncond + guidance * cfg_delta
                    else:
                        noise_pred = noise_pred + (guidance -
                                                   1.0) * cfg_delta
                    if batch.guidance_rescale and batch.guidance_rescale > 0:
                        # arXiv 2305.08891 §3.4 (reference
                        # stages/denoising.py:584-590): rescale the
                        # combined prediction toward the text pass's std
                        dims = tuple(range(1, noise_pred.ndim))
                        std_t = jnp.std(noise_text.astype(jnp.float32),
                                        axis=dims, keepdims=True)
                        std_c = jnp.std(noise_pred.astype(jnp.float32),
                                        axis=dims, keepdims=True)
                        rescaled = noise_pred * (std_t / std_c)
                        gr = float(batch.guidance_rescale)
                        noise_pred = gr * rescaled + (1.0 - gr) * noise_pred
            latents = self.scheduler.step(
                noise_pred.astype(jnp.float32), t,
                latents.astype(jnp.float32)).prev_sample
            if envs.FASTVIDEO_TRACE_ACTIVATIONS:
                from fastvideo_tpu.hooks import trace_activation
                trace_activation("denoise.noise_pred", noise_pred, step=i)
                trace_activation("denoise.latents", latents, step=i)
            if ti2v:
                # re-impose the conditioned first frame after every
                # scheduler step (reference stages/denoising.py:597-600)
                latents = self._ti2v_blend(latents, ti2v_z)
            if batch.return_trajectory_latents:
                trajectory.append(latents)

        batch.latents = latents
        if batch.return_trajectory_latents:
            batch.trajectory_latents = jnp.stack(trajectory, axis=1)
            batch.trajectory_timesteps = timesteps
        return batch


class DmdDenoisingStage(DenoisingStage):
    """3-step distilled sampling (reference stages/denoising.py:1250).

    Per step: predict x0 via flow update to sigma=0, then renoise to the
    next timestep's sigma with fresh noise.
    """

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        from fastvideo_tpu.pipelines.stages.latent_preparation import (
            randn_like_reference)

        target_dtype = jnp.bfloat16 if (
            self.pipeline_config is None
            or self.pipeline_config.precision == "bf16") else jnp.float32
        latents = batch.latents
        pos_ctx = batch.prompt_embeds[0].astype(target_dtype)
        timesteps = list(batch.timesteps)
        num_train = self.scheduler.num_train_timesteps
        sigmas = [float(t) / num_train for t in timesteps]

        attn_metadata = self._build_attn_metadata(batch, fastvideo_args)
        step_fn, state = self._get_step_fn("main")
        for i, t in enumerate(timesteps):
            t_arr = jnp.full((latents.shape[0],), float(t), jnp.float32)
            model_in = self._model_input(batch, latents.astype(target_dtype))
            if attn_metadata is not None:
                attn_metadata.current_timestep = i
            with set_forward_context(current_timestep=i,
                                     attn_metadata=attn_metadata,
                                     forward_batch=batch):
                flow_pred = step_fn(state, model_in, pos_ctx, t_arr, None,
                                    image_cond=False)
            sigma = sigmas[i]
            x0 = latents.astype(jnp.float32) - sigma * flow_pred.astype(
                jnp.float32)
            if i < len(timesteps) - 1:
                next_sigma = sigmas[i + 1]
                renoise_seeds = [s + i + 1 for s in (batch.seeds or [0])]
                from fastvideo_tpu import envs
                if envs.FASTVIDEO_DEVICE_RNG:
                    # same seed-batching contract as latent prep: threefry
                    # on device instead of a host numpy gen + 8 MB H2D
                    # per DMD step (seed-deterministic, not torch-bitwise)
                    from fastvideo_tpu.pipelines.stages.latent_preparation \
                        import _device_randn
                    noise = _device_randn(tuple(latents.shape),
                                          tuple(renoise_seeds))
                else:
                    noise = jnp.asarray(
                        randn_like_reference(tuple(latents.shape),
                                             renoise_seeds))
                latents = (1.0 - next_sigma) * x0 + next_sigma * noise
            else:
                latents = x0
        batch.latents = latents
        return batch
