"""LTX-2 text-to-(audio)video pipeline.

Analog of /root/reference/fastvideo/pipelines/basic/ltx2/ltx2_pipeline.py
(:55-180) and stages/ltx2_denoising.py: Gemma text encoding, joint
audio+video denoising over the official distilled sigma schedule (or the
shifted computed schedule), Euler updates on the DENOISED predictions
(v = (x - denoised)/sigma), LTX-2 VAE video decode. Audio mel latents are
carried on ``batch.extra["ltx2_audio_latents"]``; the vocoder/audio-VAE
decode stage runs when those modules ship with the checkpoint (reference
LTX2AudioDecodingStage), otherwise the latents pass through.

Known gap vs the reference: the Gemma CONNECTOR (a 2-block refiner that
also emits dedicated audio text embeddings) is not yet ported — both
streams condition on the Gemma hidden states directly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.composed import ComposedPipelineBase
from fastvideo_tpu.pipelines.lora_pipeline import LoRAPipelineMixin
from fastvideo_tpu.pipelines.stages.base import PipelineStage
from fastvideo_tpu.pipelines.stages.input_validation import (
    InputValidationStage)
from fastvideo_tpu.pipelines.stages.latent_preparation import (
    randn_like_reference)
from fastvideo_tpu.pipelines.stages.text_encoding import TextEncodingStage

# Official distilled sigma schedule (reference ltx2_denoising.py:44)
DISTILLED_SIGMA_VALUES = [1.0, 0.99375, 0.9875, 0.98125, 0.975, 0.909375,
                          0.725, 0.421875, 0.0]
LTX2_AUDIO_CHANNELS = 8
LTX2_AUDIO_MEL_BINS = 16


def ltx2_sigmas(steps: int, tokens: int = 1024) -> np.ndarray:
    """Token-count-shifted schedule (reference _ltx2_sigmas :66-99)."""
    sigmas = np.linspace(1.0, 0.0, steps + 1)
    mm = (0.95 - 1.0) / (4096 - 256)
    b = 1.0 - mm * 256
    sigma_shift = tokens * mm + b
    numerator = math.exp(sigma_shift)
    nz = sigmas != 0
    out = np.zeros_like(sigmas)
    out[nz] = numerator / (numerator + (1 / sigmas[nz] - 1))
    return out


def distilled_subset_sigmas(steps: int) -> np.ndarray:
    """Distilled subset minimizing the largest adjacent gap (reference
    _distilled_subset_sigmas :102-150)."""
    full = np.asarray(DISTILLED_SIGMA_VALUES)
    if steps >= len(full) - 1:
        return full
    import itertools

    best, best_gap = None, np.inf
    for mids in itertools.combinations(range(1, len(full) - 1), steps - 1):
        idx = [0, *mids, len(full) - 1]
        gaps = -np.diff(full[idx])
        if gaps.max() < best_gap:
            best_gap, best = gaps.max(), idx
    return full[list(best)]


class LTX2LatentPreparationStage(PipelineStage):
    def __init__(self, transformer, vae_config=None):
        self.transformer = transformer
        self.vae_config = vae_config

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        arch = getattr(self.vae_config, "arch_config", self.vae_config)
        sr = arch.spatial_compression_ratio
        tr = arch.temporal_compression_ratio
        z = arch.z_dim
        lat_t = (batch.num_frames - 1) // tr + 1
        shape = (1, z, lat_t, batch.height // sr, batch.width // sr)
        if batch.latents is None:
            noise = randn_like_reference(shape,
                                         batch.seeds or [batch.seed or 0])
            batch.latents = jnp.asarray(noise)
        batch.raw_latent_shape = shape
        # audio mel latents: frames ~ duration * sample_rate / hop / 4
        fps = float(batch.fps or 24)
        duration = batch.num_frames / fps
        audio_frames = max(1, int(round(
            duration * 16000 / 160 / 4)))
        a_shape = (1, LTX2_AUDIO_CHANNELS, audio_frames,
                   LTX2_AUDIO_MEL_BINS)
        a_noise = randn_like_reference(
            a_shape, [(batch.seed or 0) + 1])
        batch.extra["ltx2_audio_latents"] = jnp.asarray(a_noise)
        return batch


class LTX2DenoisingStage(PipelineStage):
    """Joint AV Euler-on-denoised loop (reference ltx2_denoising.py
    :153-680, the text-CFG guidance path). The audio stream conditions on
    the Gemma connector's dedicated audio text embeddings when the
    encoder provides them (batch.extra['audio_text_embeds'])."""

    def __init__(self, transformer, pipeline_config=None):
        self.transformer = transformer
        self.pipeline_config = pipeline_config
        self._step = None

    def _get_step(self):
        if self._step is None:
            graphdef, state = nnx.split(self.transformer)

            @jax.jit
            def step(state, latents, ctx, t, audio, audio_ctx, a_t):
                m = nnx.merge(graphdef, state)
                return m(latents, ctx, t, audio_hidden_states=audio,
                         audio_encoder_hidden_states=audio_ctx,
                         audio_timestep=a_t)

            self._step = (step, state)
        return self._step

    def _sigmas(self, batch: ForwardBatch) -> np.ndarray:
        steps = batch.num_inference_steps
        if steps <= len(DISTILLED_SIGMA_VALUES) - 1:
            return distilled_subset_sigmas(steps)
        return ltx2_sigmas(steps)

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        target_dtype = jnp.bfloat16 if (
            self.pipeline_config is None
            or self.pipeline_config.precision == "bf16") else jnp.float32
        latents = batch.latents.astype(jnp.float32)
        audio = batch.extra["ltx2_audio_latents"].astype(jnp.float32)
        ctx = batch.prompt_embeds[0].astype(target_dtype)
        neg_ctx = (batch.negative_prompt_embeds[0].astype(target_dtype)
                   if batch.negative_prompt_embeds else None)
        audio_ctx = batch.extra.get("audio_text_embeds")
        audio_ctx = (ctx if audio_ctx is None
                     else audio_ctx.astype(target_dtype))
        neg_audio_ctx = batch.extra.get("negative_audio_text_embeds")
        neg_audio_ctx = (neg_ctx if neg_audio_ctx is None
                         else neg_audio_ctx.astype(target_dtype))
        guidance = float(batch.guidance_scale)
        use_cfg = (batch.do_classifier_free_guidance and guidance > 1.0
                   and neg_ctx is not None)

        sigmas = self._sigmas(batch)
        batch.timesteps = sigmas[:-1] * 1000.0

        b = latents.shape[0]
        step, state = self._get_step()
        for i in range(len(sigmas) - 1):
            sigma = float(sigmas[i])
            dt = float(sigmas[i + 1]) - sigma
            t = jnp.full((b, 1), sigma, jnp.float32)
            a_t = jnp.full((b, 1), sigma, jnp.float32)
            pos_v, pos_a = step(state, latents.astype(target_dtype), ctx,
                                t, audio.astype(target_dtype), audio_ctx,
                                a_t)
            denoised_v = pos_v.astype(jnp.float32)
            denoised_a = pos_a.astype(jnp.float32)
            if use_cfg:
                neg_v, neg_a = step(state, latents.astype(target_dtype),
                                    neg_ctx, t,
                                    audio.astype(target_dtype),
                                    neg_audio_ctx, a_t)
                denoised_v = denoised_v + (guidance - 1) * (
                    denoised_v - neg_v.astype(jnp.float32))
                denoised_a = denoised_a + (guidance - 1) * (
                    denoised_a - neg_a.astype(jnp.float32))
            velocity = (latents - denoised_v) / max(sigma, 1e-6)
            latents = latents + velocity * dt
            a_velocity = (audio - denoised_a) / max(sigma, 1e-6)
            audio = audio + a_velocity * dt
        batch.latents = latents
        batch.extra["ltx2_audio_latents"] = audio
        return batch


STAGE_2_DISTILLED_SIGMA_VALUES = (0.909375, 0.725, 0.421875, 0.0)


class LTX2UpsampleStage(PipelineStage):
    """Stage-2 refine init (reference pipelines/basic/ltx2/stages/
    ltx2_refine.py:116-260): 2x latent upsample through the per-channel
    statistics, then renoise to the refine schedule's first sigma. No-op
    unless refinement was requested AND the checkpoint ships an
    upsampler."""

    def __init__(self, upsampler, vae, sigmas=STAGE_2_DISTILLED_SIGMA_VALUES):
        self.upsampler = upsampler
        self.vae = vae
        self.sigmas = tuple(sigmas)
        self._fn = None

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if self.upsampler is None or not batch.extra.get("ltx2_refine"):
            return batch
        if self._fn is None:
            graphdef, ustate = nnx.split(self.upsampler)
            # stats live on the encoder/decoder submodules (reference
            # requires the encoder's: ltx2_refine.py:170-175)
            holder = (getattr(self.vae, "encoder", None)
                      or getattr(self.vae, "decoder", None) or self.vae)
            vae_stats = holder.per_channel_statistics

            @jax.jit
            def fn(ustate, z):
                ups = nnx.merge(graphdef, ustate)
                # NCDHW -> channels-last for the conv stack; denormalize
                # through the VAE's per-channel stats (reference
                # upsample_video:283-297)
                z = z.transpose(0, 2, 3, 4, 1)
                z = vae_stats.normalize(ups(vae_stats.un_normalize(z)))
                return z.transpose(0, 4, 1, 2, 3)

            self._fn = (fn, ustate)
        fn, ustate = self._fn
        up = fn(ustate, batch.latents.astype(jnp.float32))
        sigma0 = float(self.sigmas[0])
        noise = jnp.asarray(randn_like_reference(
            tuple(up.shape), [(batch.seed or 0) + 7]))
        batch.latents = (1.0 - sigma0) * up + sigma0 * noise
        audio = batch.extra.get("ltx2_audio_latents")
        if audio is not None:
            # same noise mixing as the video latents — the refine stage
            # denoises audio from sigma0 too (reference
            # stages/ltx2_refine.py:292-295)
            a_noise = jnp.asarray(randn_like_reference(
                tuple(audio.shape), [(batch.seed or 0) + 11]))
            batch.extra["ltx2_audio_latents"] = (
                (1.0 - sigma0) * audio.astype(jnp.float32) +
                sigma0 * a_noise)
        batch.extra["ltx2_refine_sigmas"] = np.asarray(self.sigmas)
        return batch


class LTX2RefineDenoisingStage(LTX2DenoisingStage):
    """Stage-2 denoise over the distilled refine schedule (reference
    ltx2_refine.py + denoising): runs only after LTX2UpsampleStage armed
    the refine sigmas."""

    def _sigmas(self, batch: ForwardBatch) -> np.ndarray:
        return np.asarray(batch.extra["ltx2_refine_sigmas"], np.float64)

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if "ltx2_refine_sigmas" not in batch.extra:
            return batch
        return super().forward(batch, fastvideo_args)


class LTX2DecodingStage(PipelineStage):
    def __init__(self, vae, pipeline_config=None):
        self.vae = vae
        self.pipeline_config = pipeline_config
        self._decode = None

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if self._decode is None:
            graphdef, state = nnx.split(self.vae)

            @jax.jit
            def decode(state, z):
                m = nnx.merge(graphdef, state)
                # deterministic decode noise: zeros (the reference's
                # generator-seeded randn with scale 0.025)
                return m.decode(z, noise=jnp.zeros(
                    z.shape[:1] + z.shape[2:] + z.shape[1:2], z.dtype))

            self._decode = (decode, state)
        decode, state = self._decode
        batch.output = decode(state, batch.latents.astype(jnp.float32))
        return batch


class LTX2AudioDecodingStage(PipelineStage):
    """Mel latents -> waveform when the audio VAE + vocoder ship with the
    checkpoint (reference stages/ltx2_audio_decoding.py); otherwise the
    mel latents stay on ``batch.extra`` for downstream use."""

    def __init__(self, audio_vae=None, vocoder=None):
        self.audio_vae = audio_vae
        self.vocoder = vocoder

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if self.audio_vae is None or self.vocoder is None:
            return batch
        mel = self.audio_vae.decode(batch.extra["ltx2_audio_latents"])
        batch.extra["ltx2_audio_waveform"] = self.vocoder(mel)
        return batch


class LTX2Pipeline(ComposedPipelineBase, LoRAPipelineMixin):
    _required_config_modules = [
        "text_encoder", "tokenizer", "transformer", "vae", "scheduler",
        "spatial_upsampler"
    ]
    _extra_config_module_map = {"spatial_upsampler": "spatial_upscaler"}

    def initialize_pipeline(self, fastvideo_args: FastVideoArgs) -> None:
        # LTX-2 integrates its own sigma schedule in the denoising stage;
        # the checkpoint scheduler module is unused (reference pipeline
        # has no scheduler stage).
        pass

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
                       LTX2LatentPreparationStage(
                           self.get_module("transformer"), cfg.vae_config))
        self.add_stage("denoising_stage",
                       LTX2DenoisingStage(self.get_module("transformer"),
                                          cfg))
        # stage-2 refine: no-ops unless the checkpoint ships an upsampler
        # and the request sets extra['ltx2_refine']
        self.add_stage("upsample_stage",
                       LTX2UpsampleStage(
                           self.modules.get("spatial_upsampler"),
                           self.get_module("vae")))
        self.add_stage("refine_denoising_stage",
                       LTX2RefineDenoisingStage(
                           self.modules.get("transformer_refine")
                           or self.get_module("transformer"), cfg))
        self.add_stage("audio_decoding_stage",
                       LTX2AudioDecodingStage(
                           self.modules.get("audio_vae"),
                           self.modules.get("vocoder")))
        self.add_stage("decoding_stage",
                       LTX2DecodingStage(self.get_module("vae"), cfg))


EntryClass = LTX2Pipeline
