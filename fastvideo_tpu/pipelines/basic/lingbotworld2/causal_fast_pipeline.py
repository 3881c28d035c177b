"""LingBot-World 2 causal-fast pipeline (streaming I2V world model).

Behavioral reference: /root/reference/fastvideo/pipelines/basic/
lingbotworld2/causal_fast_pipeline.py (:47-365): per chunk_size latent
frames — distilled few-step denoise (timesteps_index subset of a
shift-10 schedule, x0 conversion + renoise between steps) against the
rolling KV caches, then one clean t=0 context pass that commits the
chunk; camera Plücker maps and the [mask | first-frame] VAE condition
are chunked alongside.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.models.schedulers.flow_match_euler import (
    FlowMatchEulerDiscreteScheduler)
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.composed import ComposedPipelineBase
from fastvideo_tpu.pipelines.lora_pipeline import LoRAPipelineMixin
from fastvideo_tpu.pipelines.stages.base import PipelineStage
from fastvideo_tpu.pipelines.stages.decoding import DecodingStage
from fastvideo_tpu.pipelines.stages.image_encoding import (
    WanImageVAEEncodingStage)
from fastvideo_tpu.pipelines.stages.input_validation import (
    InputValidationStage)
from fastvideo_tpu.pipelines.stages.latent_preparation import (
    LatentPreparationStage, randn_like_reference)
from fastvideo_tpu.pipelines.stages.text_encoding import TextEncodingStage


class LingBotWorld2GenerationStage(PipelineStage):
    """Chunked causal generation (reference :220-332)."""

    def __init__(self, transformer, scheduler, pipeline_config=None):
        self.transformer = transformer
        self.scheduler = scheduler
        self.pipeline_config = pipeline_config
        self._fwd = None

    def _get_fwd(self):
        if self._fwd is None:
            graphdef, state = nnx.split(self.transformer)

            @jax.jit
            def fwd(state, latents, ctx, t, caches, freqs, cam, ca_caches):
                m = nnx.merge(graphdef, state)
                return m.forward_block(latents, ctx, t, caches,
                                       freqs_cis=freqs,
                                       c2ws_plucker_emb=cam,
                                       crossattn_caches=ca_caches)

            @jax.jit
            def precompute_ca(state, ctx):
                m = nnx.merge(graphdef, state)
                return m.precompute_crossattn_caches(ctx)

            self._fwd = (fwd, precompute_ca, state)
        return self._fwd

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        from fastvideo_tpu.layers.rotary import get_rotary_pos_embed_wan

        cfg = self.transformer.config
        target_dtype = jnp.bfloat16 if (
            self.pipeline_config is None
            or self.pipeline_config.precision == "bf16") else jnp.float32
        latents = batch.latents.astype(jnp.float32)
        b, c, t, h, w = latents.shape
        pt, ph, pw = cfg.patch_size
        chunk = int(getattr(cfg, "chunk_size", 4))
        if t % chunk != 0:
            # drop trailing frames so the stream is whole chunks
            # (reference :247 lat_f -= lat_f % chunk_size)
            t = t - (t % chunk)
            latents = latents[:, :, :t]
        ctx = batch.prompt_embeds[0].astype(target_dtype)
        y = batch.image_latent  # [B, 20, T, h, w] mask+cond
        assert y is not None, "LingBot-World 2 is I2V: image required"
        y = y.astype(jnp.float32)[:, :, :t]
        cam = batch.extra.get("c2ws_plucker_emb")
        if cam is not None:
            cam = jnp.asarray(cam, jnp.float32)[:, :, :t]

        # distilled timestep subset on the shift-10 schedule
        # (reference :261-262, :312-329)
        self.scheduler.set_timesteps(cfg.num_train_timesteps
                                     if hasattr(cfg, "num_train_timesteps")
                                     else 1000)
        ts_idx = list(getattr(cfg, "timesteps_index", (0, 250, 500, 750)))
        timesteps = [float(np.asarray(self.scheduler.timesteps)[i])
                     for i in ts_idx]
        num_train = self.scheduler.num_train_timesteps
        sched_sigmas = np.asarray(self.scheduler.sigmas)
        sched_ts = np.asarray(self.scheduler.timesteps)

        def sigma_of(t_val: float) -> float:
            return float(sched_sigmas[int(np.abs(sched_ts - t_val).argmin())])

        frame_seqlen = (h // ph) * (w // pw)
        caches = self.transformer.init_caches(b, frame_seqlen, target_dtype)
        fwd, precompute_ca, state = self._get_fwd()
        # text K/V once per prompt instead of per chunk per step
        ca_caches = precompute_ca(state, ctx)

        out_chunks = []
        seed = batch.seed or 0
        for ci in range(t // chunk):
            s = ci * chunk
            cur = latents[:, :, s:s + chunk]
            cur_y = y[:, :, s:s + chunk]
            cur_cam = None if cam is None else cam[:, :, s:s + chunk]
            freqs = get_rotary_pos_embed_wan(
                (chunk // pt, h // ph, w // pw), cfg.attention_head_dim,
                cfg.rope_theta, start_frame=s)
            x0 = cur
            for i, t_cur in enumerate(timesteps):
                t_arr = jnp.full((b,), t_cur, jnp.float32)
                model_in = jnp.concatenate(
                    [cur, cur_y], axis=1).astype(target_dtype)
                flow, _ = fwd(state, model_in, ctx, t_arr, caches, freqs,
                              cur_cam, ca_caches)
                sigma = t_cur / num_train
                x0 = cur - sigma * flow.astype(jnp.float32)
                if i < len(timesteps) - 1:
                    next_sigma = sigma_of(timesteps[i + 1])
                    noise = jnp.asarray(randn_like_reference(
                        tuple(x0.shape), [seed + 100 * ci + i + 1]))
                    cur = (1.0 - next_sigma) * x0 + next_sigma * noise
            out_chunks.append(x0)
            # clean t=0 context pass commits the chunk's KV
            t_ctx = jnp.zeros((b,), jnp.float32)
            model_in = jnp.concatenate(
                [x0, cur_y], axis=1).astype(target_dtype)
            _, caches = fwd(state, model_in, ctx, t_ctx, caches, freqs,
                            cur_cam, ca_caches)

        batch.latents = jnp.concatenate(out_chunks, axis=2)
        return batch


class LingBotWorld2CameraStage(PipelineStage):
    """Same Plücker condition builder as LingBot-World 1."""

    def __init__(self, vae_config=None):
        from fastvideo_tpu.pipelines.basic.lingbotworld. \
            lingbotworld_pipeline import LingBotWorldCameraStage

        self._inner = LingBotWorldCameraStage(vae_config)

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        return self._inner.forward(batch, fastvideo_args)


class LingBotWorld2CausalFastPipeline(ComposedPipelineBase,
                                      LoRAPipelineMixin):
    _required_config_modules = [
        "text_encoder", "tokenizer", "vae", "transformer", "scheduler"
    ]

    def initialize_pipeline(self, fastvideo_args: FastVideoArgs) -> None:
        arch = self.pipeline_config.dit_config.arch_config
        self.modules["scheduler"] = FlowMatchEulerDiscreteScheduler(
            shift=getattr(arch, "sample_shift", 10.0))

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
        self.add_stage("image_vae_encoding_stage",
                       WanImageVAEEncodingStage(self.get_module("vae"),
                                                cfg.vae_config))
        self.add_stage("camera_stage",
                       LingBotWorld2CameraStage(cfg.vae_config))
        self.add_stage("generation_stage",
                       LingBotWorld2GenerationStage(
                           self.get_module("transformer"),
                           self.get_module("scheduler"), cfg))
        self.add_stage("decoding_stage",
                       DecodingStage(self.get_module("vae"), cfg))


EntryClass = LingBotWorld2CausalFastPipeline
