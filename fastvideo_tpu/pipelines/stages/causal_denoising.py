"""Causal (self-forcing) denoising stage: block-autoregressive generation.

Analog of /root/reference/fastvideo/pipelines/stages/causal_denoising.py
(:437-620): per num_frames_per_block block — reset scheduler, denoise the
block with the rolling KV caches *frozen* (each step's cache writes are
discarded, matching the reference's same-position overwrites), then run one
clean context pass that commits the block's KV into the caches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.forward_context import set_forward_context
from fastvideo_tpu.layers.rotary import get_rotary_pos_embed_wan
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.stages.base import PipelineStage

logger = init_logger(__name__)


class CausalDenoisingStage(PipelineStage):
    def __init__(self, transformer, scheduler, pipeline_config=None):
        self.transformer = transformer
        self.scheduler = scheduler
        self.pipeline_config = pipeline_config
        self._fwd = None

    def _get_fwd(self):
        if self._fwd is None:
            graphdef, state = nnx.split(self.transformer)

            # pred-only: XLA dead-code-eliminates the rolled KV writeback
            # the denoise steps never consume (a cache-sized allocation per
            # step otherwise — ~6 GB at 1.3B/480p, an OOM on 16 GB chips)
            @jax.jit
            def fwd(state, latents, ctx, t, caches, freqs, ca_caches):
                m = nnx.merge(graphdef, state)
                pred, _ = m.forward_block(latents, ctx, t, caches,
                                          freqs_cis=freqs,
                                          crossattn_caches=ca_caches)
                return pred

            # once-per-block commit: donate the old caches so XLA aliases
            # them with the returned ones instead of holding 2x cache HBM
            @functools.partial(jax.jit, donate_argnums=(4,))
            def fwd_update(state, latents, ctx, t, caches, freqs,
                           ca_caches):
                m = nnx.merge(graphdef, state)
                return m.forward_block(latents, ctx, t, caches,
                                       freqs_cis=freqs,
                                       crossattn_caches=ca_caches)

            @jax.jit
            def precompute_ca(state, ctx):
                m = nnx.merge(graphdef, state)
                return m.precompute_crossattn_caches(ctx)

            self._fwd = (fwd, fwd_update, precompute_ca, state)
        return self._fwd

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        cfg = self.transformer.config
        target_dtype = jnp.bfloat16 if (
            self.pipeline_config is None
            or self.pipeline_config.precision == "bf16") else jnp.float32
        latents = batch.latents.astype(jnp.float32)
        b, c, t, h, w = latents.shape
        pt, ph, pw = cfg.patch_size
        frame_seqlen = (h // ph) * (w // pw)
        nfpb = cfg.num_frames_per_block
        if t % nfpb != 0:
            raise ValueError(
                f"num latent frames {t} not divisible by block {nfpb}")
        ctx = batch.prompt_embeds[0].astype(target_dtype)

        caches = self.transformer.init_caches(b, frame_seqlen, target_dtype)
        fwd, fwd_update, precompute_ca, state = self._get_fwd()
        # text K/V once per prompt instead of per block per step
        ca_caches = precompute_ca(state, ctx)

        num_blocks = t // nfpb
        out_blocks = []
        for blk in range(num_blocks):
            s = blk * nfpb
            cur = latents[:, :, s:s + nfpb]
            freqs = get_rotary_pos_embed_wan(
                (nfpb // pt, h // ph, w // pw), cfg.attention_head_dim,
                cfg.rope_theta, start_frame=s)
            self.scheduler.set_timesteps(batch.num_inference_steps)
            for i, t_cur in enumerate(self.scheduler.timesteps):
                t_arr = jnp.full((b,), float(t_cur), jnp.float32)
                with set_forward_context(current_timestep=i,
                                         forward_batch=batch):
                    # cache writes DCE'd during denoising (pred-only jit)
                    pred = fwd(state, cur.astype(target_dtype), ctx,
                               t_arr, caches, freqs, ca_caches)
                cur = self.scheduler.step(pred.astype(jnp.float32), t_cur,
                                          cur).prev_sample
            out_blocks.append(cur)
            # commit clean context into the caches
            t_ctx = jnp.zeros((b,), jnp.float32)
            with set_forward_context(current_timestep=0,
                                     forward_batch=batch):
                _, caches = fwd_update(state, cur.astype(target_dtype),
                                       ctx, t_ctx, caches, freqs,
                                       ca_caches)

        batch.latents = jnp.concatenate(out_blocks, axis=2)
        batch.extra["kv_caches"] = caches
        return batch
