"""DreamX-World autoregressive causal denoising.

Behavioral reference: /root/reference/fastvideo/pipelines/basic/
dreamx_world/ar_denoising.py (:17-219): per num_frames_per_block block —
few-step DMD denoise (dmd_denoising_steps warped through the shift
schedule), per-token timesteps with the conditioned first frame pinned
to 0 in block 0, a first-frame mask that keeps the conditioning latent
fixed, camera poses sliced per block, then a context re-cache pass at
the context-noise timestep committing the block's KV (self + PRoPE).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.stages.base import PipelineStage
from fastvideo_tpu.pipelines.stages.latent_preparation import (
    randn_like_reference)


class DreamXWorldARDenoisingStage(PipelineStage):
    def __init__(self, transformer, scheduler, pipeline_config=None,
                 vae=None):
        self.transformer = transformer
        self.scheduler = scheduler
        self.pipeline_config = pipeline_config
        self.vae = vae
        self._fwd = None

    def _get_fwd(self):
        if self._fwd is None:
            graphdef, state = nnx.split(self.transformer)

            @jax.jit
            def fwd(state, latents, ctx, t, caches, cam_caches, freqs,
                    viewmats, intrinsics, ca_caches):
                m = nnx.merge(graphdef, state)
                return m.forward_block(
                    latents, ctx, t, caches, freqs_cis=freqs,
                    y_camera={"viewmats": viewmats, "K": intrinsics},
                    cam_caches=cam_caches, crossattn_caches=ca_caches)

            @jax.jit
            def precompute_ca(state, ctx):
                m = nnx.merge(graphdef, state)
                return m.precompute_crossattn_caches(ctx)

            self._fwd = (fwd, precompute_ca, state)
        return self._fwd

    def _first_frame_latent(self, batch: ForwardBatch):
        """TI2V conditioning: encode the prompt image into latent frame 0
        (reference ar_denoising.py:58-59 via image_latent)."""
        if batch.pil_image is None or self.vae is None:
            return None
        img = np.asarray(batch.pil_image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 127.5 - 1.0
        if img.ndim == 3:
            img = img.transpose(2, 0, 1)[None, :, None]
        z = self.vae.encode(jnp.asarray(img, jnp.float32)).mean
        z = jnp.transpose(z, (0, 4, 1, 2, 3))
        return self.vae.normalize_latents(z).astype(jnp.float32)

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        from fastvideo_tpu.layers.rotary import get_rotary_pos_embed_wan

        cfg = self.transformer.config
        pcfg = self.pipeline_config
        target_dtype = jnp.bfloat16 if (
            pcfg is None or pcfg.precision == "bf16") else jnp.float32
        latents = batch.latents.astype(jnp.float32)
        b, c, t, h, w = latents.shape
        pt, ph, pw = cfg.patch_size
        frame_seqlen = (h // ph) * (w // pw)
        nfpb = int(getattr(cfg, "num_frames_per_block", 3))
        if t % nfpb != 0:
            raise ValueError(
                f"AR latent frames {t} not divisible by block {nfpb}")
        ctx = batch.prompt_embeds[0].astype(target_dtype)

        # warped DMD timesteps (reference :38-46)
        steps = tuple(getattr(pcfg, "dmd_denoising_steps", None)
                      or (1000, 750, 500, 250))
        if getattr(pcfg, "warp_denoising_step", True):
            self.scheduler.set_timesteps(1000)
            table = np.concatenate([np.asarray(self.scheduler.timesteps),
                                    [0.0]])
            steps = tuple(float(table[1000 - int(s)]) for s in steps)
        num_train = self.scheduler.num_train_timesteps

        # first-frame conditioning
        z0 = self._first_frame_latent(batch)
        if z0 is not None:
            latents = jnp.concatenate([z0, latents[:, :, 1:]], axis=2)

        y_cam = batch.extra.get("y_camera")
        viewmats = jnp.asarray(y_cam["viewmats"], jnp.float32)
        intrinsics = jnp.asarray(y_cam["K"], jnp.float32)

        caches = self.transformer.init_caches(b, frame_seqlen, target_dtype)
        cam_caches = self.transformer.init_cam_caches(b, frame_seqlen,
                                                      target_dtype)
        fwd, precompute_ca, state = self._get_fwd()
        # text K/V once per prompt instead of per block per step
        ca_caches = precompute_ca(state, ctx)
        context_noise = float(getattr(pcfg, "context_noise", 0.1))
        context_t = (context_noise * 1000.0
                     if 0.0 < context_noise <= 1.0 else context_noise)

        seed = batch.seed or 0
        out_blocks = []
        for blk in range(t // nfpb):
            s = blk * nfpb
            cur = latents[:, :, s:s + nfpb]
            cam_v = viewmats[:, s:s + nfpb]
            cam_k = intrinsics[:, s:s + nfpb]
            freqs = get_rotary_pos_embed_wan(
                (nfpb // pt, h // ph, w // pw), cfg.attention_head_dim,
                cfg.rope_theta, start_frame=s)
            seq = nfpb * frame_seqlen
            noisy_input = cur
            for i, t_cur in enumerate(steps):
                t_tok = jnp.full((b, seq), float(t_cur), jnp.float32)
                if blk == 0 and z0 is not None:
                    # conditioned first frame runs at t=0 (reference :93-95)
                    t_tok = t_tok.at[:, :frame_seqlen].set(0.0)
                denoised, _, _ = fwd(state, cur.astype(target_dtype), ctx,
                                     t_tok, caches, cam_caches, freqs,
                                     cam_v, cam_k, ca_caches)
                denoised = denoised.astype(jnp.float32)
                if i < len(steps) - 1:
                    next_sigma = float(steps[i + 1]) / num_train
                    noise = jnp.asarray(randn_like_reference(
                        tuple(denoised.shape),
                        [seed + 1_000_003 + 31 * blk + i]))
                    cur = (1.0 - next_sigma) * denoised + next_sigma * noise
                else:
                    cur = denoised
                if blk == 0 and z0 is not None:
                    # first-frame mask keeps the conditioning latent fixed
                    cur = jnp.concatenate(
                        [noisy_input[:, :, :1], cur[:, :, 1:]], axis=2)
            out_blocks.append(cur)
            # context re-cache pass commits this block's KV
            t_tok = jnp.full((b, seq), float(context_t), jnp.float32)
            _, caches, cam_caches = fwd(state, cur.astype(target_dtype),
                                        ctx, t_tok, caches, cam_caches,
                                        freqs, cam_v, cam_k, ca_caches)

        batch.latents = jnp.concatenate(out_blocks, axis=2)
        return batch
