"""Stable Audio Open pipeline (T2A + A2A variation + RePaint inpainting).

Behavioral reference:
/root/reference/fastvideo/pipelines/basic/stable_audio/
(stable_audio_pipeline.py:62-125 + stages/). TPU-native: the DiT step is
one jitted CFG-batched program; the dpmpp-3m-sde loop drives it from
python (O(100) dispatches); the Oobleck decode is a second program.

Modes (kwargs on ``generate_video``):
  * Text-to-audio (default): ``prompt=..., audio_end_in_s=...``
  * A2A variation: add ``init_audio`` ([C, samples] array) and optionally
    ``init_audio_strength`` (0..1) or raw ``init_noise_level``
  * RePaint inpainting: add ``inpaint_audio`` + ``inpaint_mask``
    (1-D {0,1} array at the model sample rate, or a
    ``(keep_seconds, total_seconds)`` tuple)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.models.schedulers.dpmpp_3m_sde import (
    get_sigmas_polyexponential, sample_dpmpp_3m_sde, v_denoiser)
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.composed import ComposedPipelineBase
from fastvideo_tpu.pipelines.stages.base import PipelineStage
from fastvideo_tpu.pipelines.stages.input_validation import (
    InputValidationStage)

Array = jax.Array


class StableAudioConditioningStage(PipelineStage):
    """Conditioner -> (cross_attn_cond, mask, global_embed) triples on
    batch.extra (reference stages/conditioning.py)."""

    def __init__(self, conditioner, pipeline_config):
        self.conditioner = conditioner
        self.pipeline_config = pipeline_config

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        pc = self.pipeline_config
        start = float(batch.extra.get("audio_start_in_s",
                                      pc.audio_start_in_s))
        end = float(batch.extra.get("audio_end_in_s", pc.audio_end_in_s))
        max_s = pc.sample_size / pc.sampling_rate
        if start < 0 or end <= start:
            raise ValueError(f"bad audio window [{start}, {end}]")
        if end > max_s:
            raise ValueError(
                f"audio_end_in_s ({end}s) exceeds the model's fixed window "
                f"of {max_s:.3f}s")
        gs = float(batch.guidance_scale or pc.guidance_scale)
        do_cfg = gs > 1.0
        prompt = batch.prompt
        if isinstance(prompt, list):
            if len(prompt) > 1:
                raise ValueError("Stable Audio takes a single prompt")
            prompt = prompt[0] if prompt else ""

        def triple(text):
            vals = {"prompt": text, "seconds_start": start,
                    "seconds_total": end}
            active = self.conditioner.cross_attention_cond_ids
            meta = [{k: vals[k] for k in set(active) | set(
                self.conditioner.global_cond_ids) if k in vals}]
            return self.conditioner.get_conditioning_inputs(
                self.conditioner(meta))

        cross, mask, glob = triple(prompt)
        batch.extra.update(cross_attn_cond=cross, cross_attn_mask=mask,
                           global_embed=glob, do_cfg=do_cfg,
                           audio_start_in_s=start, audio_end_in_s=end)
        if do_cfg:
            neg = batch.negative_prompt or ""
            if isinstance(neg, list):
                neg = neg[0] if neg else ""
            ncross, nmask, nglob = triple(neg)
            # masked negative cond zero-filled where mask == 0
            ncross = ncross * nmask[..., None]
            batch.extra.update(negative_cross_attn_cond=ncross,
                               negative_global_embed=nglob)
        return batch


class StableAudioLatentPreparationStage(PipelineStage):
    """Seeded Gaussian latent [B, io, sample_size/hop]; encodes A2A /
    inpaint references (reference stages/latent_preparation.py)."""

    def __init__(self, vae, pipeline_config):
        self.vae = vae
        self.pipeline_config = pipeline_config

    def _prep_audio(self, audio) -> Array:
        pc = self.pipeline_config
        a = jnp.asarray(np.asarray(audio), jnp.float32)
        if a.ndim == 1:
            a = a[None, None]
        elif a.ndim == 2:
            a = a[None]
        if a.shape[1] == 1 and pc.audio_channels == 2:
            a = jnp.repeat(a, 2, axis=1)
        elif a.shape[1] == 2 and pc.audio_channels == 1:
            a = a.mean(axis=1, keepdims=True)
        cur = a.shape[-1]
        if cur < pc.sample_size:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, pc.sample_size - cur)))
        return a[..., :pc.sample_size]

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        pc = self.pipeline_config
        hop = int(self.vae.hop_length)
        latent_len = pc.sample_size // hop
        io = pc.dit_config.arch_config.io_channels
        key = jax.random.PRNGKey(int((batch.seeds or [batch.seed or 0])[0]))
        key, nkey, ekey = jax.random.split(key, 3)
        batch.latents = jax.random.normal(nkey, (1, io, latent_len),
                                          jnp.float32)
        batch.extra["sampler_key"] = key

        init_audio = batch.extra.get("init_audio")
        inpaint_audio = batch.extra.get("inpaint_audio")
        inpaint_mask = batch.extra.get("inpaint_mask")
        if inpaint_audio is not None and inpaint_mask is None:
            raise ValueError("inpaint_audio requires inpaint_mask")
        if inpaint_mask is not None and inpaint_audio is None:
            raise ValueError("inpaint_mask requires inpaint_audio")
        if init_audio is not None and inpaint_audio is not None:
            raise ValueError("pass init_audio OR inpaint_audio, not both")

        def encode(audio):
            post = self.vae.encode(self._prep_audio(audio))
            return post.mean + post.std * jax.random.normal(
                ekey, post.mean.shape, jnp.float32)

        if init_audio is not None:
            batch.extra["init_latent"] = encode(init_audio)
        if inpaint_audio is not None:
            batch.extra["inpaint_reference_latent"] = encode(inpaint_audio)
            m = inpaint_mask
            if isinstance(m, tuple) and len(m) == 2:
                keep_n = int(float(m[0]) * pc.sampling_rate)
                total_n = int(float(m[1]) * pc.sampling_rate)
                mm = np.zeros(total_n, np.float32)
                mm[:keep_n] = 1.0
                m = mm
            m = np.asarray(m, np.float32).reshape(-1)
            if m.shape[-1] < pc.sample_size:
                m = np.pad(m, (0, pc.sample_size - m.shape[-1]))
            m = m[:pc.sample_size]
            # nearest-resample to the latent grid
            idx = (np.arange(latent_len) * (pc.sample_size / latent_len)
                   ).astype(np.int64)
            batch.extra["inpaint_mask_latent"] = jnp.asarray(
                m[idx])[None, None]
        return batch


class StableAudioDenoisingStage(PipelineStage):
    """k-diffusion dpmpp-3m-sde over the v-prediction DiT
    (reference stages/denoising.py)."""

    _LOG_SIGMA = (math.log(0.3), math.log(500.0))

    def __init__(self, transformer, pipeline_config):
        self.transformer = transformer
        self.pipeline_config = pipeline_config
        self._step = None

    def _get_step(self):
        if self._step is None:
            graphdef, state = nnx.split(self.transformer)

            @jax.jit
            def step(state, x, t, cond, glob):
                m = nnx.merge(graphdef, state)
                return m(x, t, cross_attn_cond=cond, global_embed=glob)

            self._step = (step, state)
        return self._step

    def _sigma_max(self, batch) -> float:
        pc = self.pipeline_config
        raw = batch.extra.get("init_noise_level")
        strength = batch.extra.get("init_audio_strength")
        if raw is not None and strength is not None:
            raise ValueError("pass init_audio_strength OR init_noise_level")
        if raw is not None:
            return float(raw)
        lmin, lmax = math.log(pc.sigma_min), math.log(pc.sigma_max)
        s = max(0.0, min(1.0, float(strength) if strength is not None
                         else 0.6))
        return math.exp(lmax - s * (lmax - lmin))

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        pc = self.pipeline_config
        ext = batch.extra
        gs = float(batch.guidance_scale or pc.guidance_scale)
        do_cfg = bool(ext.get("do_cfg"))
        steps = int(batch.num_inference_steps or pc.num_inference_steps)

        init_latent = ext.get("init_latent")
        sigma_max = (self._sigma_max(batch) if init_latent is not None
                     else pc.sigma_max)
        sigmas = get_sigmas_polyexponential(steps, pc.sigma_min, sigma_max,
                                            pc.rho)

        cond = ext["cross_attn_cond"]
        glob = ext["global_embed"]
        if do_cfg:
            cond_b = jnp.concatenate(
                [cond, ext["negative_cross_attn_cond"]], axis=0)
            glob_b = jnp.concatenate(
                [glob, ext["negative_global_embed"]], axis=0)
        else:
            cond_b, glob_b = cond, glob
        step, state = self._get_step()

        def model(x, t):
            if not do_cfg:
                return step(state, x, t, cond_b, glob_b)
            xx = jnp.concatenate([x, x], axis=0)
            tt = jnp.concatenate([t, t], axis=0)
            out = step(state, xx, tt, cond_b, glob_b)
            c, u = jnp.split(out, 2, axis=0)
            return u + (c - u) * gs

        x = batch.latents * sigmas[0]
        if init_latent is not None:
            x = x + init_latent

        callback = None
        mask = ext.get("inpaint_mask_latent")
        ref = ext.get("inpaint_reference_latent")
        if mask is not None and ref is not None:
            sig_np = np.asarray(sigmas)
            ckey = ext["sampler_key"]

            def callback(i, x, _k=[ckey]):  # noqa: B006 — keyed sequence
                _k[0], sub = jax.random.split(_k[0])
                s_next = float(sig_np[min(i + 1, len(sig_np) - 1)])
                noise = jax.random.normal(sub, ref.shape, jnp.float32)
                return (ref + noise * s_next) * mask + x * (1 - mask)

        denoise = v_denoiser(model)
        sampled = sample_dpmpp_3m_sde(denoise, x, sigmas,
                                      key=ext["sampler_key"],
                                      callback=callback)
        if mask is not None and ref is not None:
            sampled = ref * mask + sampled * (1 - mask)
        batch.latents = sampled
        return batch


class StableAudioDecodingStage(PipelineStage):
    """Oobleck decode -> waveform sliced to [start, end]
    (reference stages/decoding.py)."""

    def __init__(self, vae, pipeline_config):
        self.vae = vae
        self.pipeline_config = pipeline_config

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        pc = self.pipeline_config
        if batch.extra.get("output_type") == "latent":
            batch.output = batch.latents
            return batch
        decoded = self.vae.decode(batch.latents.astype(jnp.float32))
        sr = pc.sampling_rate
        start = float(batch.extra.get("audio_start_in_s", 0.0))
        end = float(batch.extra.get("audio_end_in_s", pc.audio_end_in_s))
        decoded = decoded[:, :, int(start * sr):int(end * sr)]
        batch.extra["audio"] = np.asarray(decoded[0].T, np.float32)
        batch.extra["audio_sample_rate"] = sr
        batch.extra["audio_only"] = True
        return batch


class StableAudioPipeline(ComposedPipelineBase):
    _required_config_modules = ["vae", "transformer", "conditioner"]

    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        cfg = self.pipeline_config
        self.add_stage("input_validation_stage", InputValidationStage())
        self.add_stage(
            "conditioning_stage",
            StableAudioConditioningStage(self.get_module("conditioner"),
                                         cfg))
        self.add_stage(
            "latent_preparation_stage",
            StableAudioLatentPreparationStage(self.get_module("vae"), cfg))
        self.add_stage(
            "denoising_stage",
            StableAudioDenoisingStage(self.get_module("transformer"), cfg))
        self.add_stage("decoding_stage",
                       StableAudioDecodingStage(self.get_module("vae"), cfg))


EntryClass = StableAudioPipeline
