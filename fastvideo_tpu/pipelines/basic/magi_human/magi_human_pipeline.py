"""daVinci-MagiHuman joint audio-video pipeline.

Behavioral reference: /root/reference/fastvideo/pipelines/basic/magi_human/
(magi_human_pipeline.py + stages/): one packed padless token document
``[video patches | audio frames | text]`` with 9-float coords and modality
tags per token, denoised jointly by the modality-expert DiT; video and
audio ride INDEPENDENT FlowUniPC schedules; CFG=2 uses a step-dependent
video guidance (relaxed below t=500); T5-Gemma conditioning padded to 640
tokens; the audio latents decode through the Stable-Audio Oobleck VAE and
are sinc-resampled by 441/512 to align 44.1 kHz audio to 25-fps video.
"""

from __future__ import annotations

import copy

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.forward_context import set_forward_context
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.models.schedulers.flow_unipc import (
    FlowUniPCMultistepScheduler)
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.composed import ComposedPipelineBase
from fastvideo_tpu.pipelines.stages.base import PipelineStage
from fastvideo_tpu.pipelines.stages.decoding import DecodingStage
from fastvideo_tpu.pipelines.stages.input_validation import (
    InputValidationStage)
from fastvideo_tpu.pipelines.stages.latent_preparation import (
    randn_like_reference)
from fastvideo_tpu.pipelines.stages.text_encoding import TextEncodingStage

logger = init_logger(__name__)

MODALITY_VIDEO, MODALITY_AUDIO, MODALITY_TEXT = 0, 1, 2
_AUDIO_TEMPORAL_COMPRESSION = 4
_UPSTREAM_AUDIO_TIME_STRETCH = 441.0 / 512.0


def _build_coords(shape, ref_feat_shape, offset_thw=(0, 0, 0)):
    """(reference stages/latent_preparation.py:43-67): [L, 9] =
    (t, h, w, ori_t, ori_h, ori_w, ref_t, ref_h, ref_w)."""
    ot, oh, ow = shape
    rt, rh, rw = ref_feat_shape
    dt, dh, dw = offset_thw
    tg, hg, wg = np.meshgrid(np.arange(ot) + dt, np.arange(oh) + dh,
                             np.arange(ow) + dw, indexing="ij")
    coords = np.stack([tg, hg, wg], axis=-1).reshape(-1, 3)
    meta = np.broadcast_to(np.asarray([ot, oh, ow, rt, rh, rw]),
                           (coords.shape[0], 6))
    return np.concatenate([coords, meta], axis=-1).astype(np.float64)


def _img2tokens(x, t_patch, patch):
    """[B, C, T, H, W] -> [L, C*pT*pH*pW], channel-major features
    (reference :78-100)."""
    b, c, t, h, w = x.shape
    x = x.reshape(b, c, t // t_patch, t_patch, h // patch, patch,
                  w // patch, patch)
    x = jnp.transpose(x, (0, 2, 4, 6, 1, 3, 5, 7))
    return x.reshape(b, -1, c * t_patch * patch * patch)[0]


def _unpack_tokens(output, video_token_num, audio_feat_len,
                   video_in_channels, audio_in_channels, latent_shape,
                   patch_size):
    """(reference :556-590): spatial-major (pT pH pW C) output layout."""
    pt, ph, pw = patch_size
    _, z, t, h, w = latent_shape
    th, tw = h // ph, w // pw
    video_flat = output[:video_token_num, :video_in_channels]
    v = video_flat.reshape(t // pt, th, tw, pt, ph, pw, z)
    v = jnp.transpose(v, (6, 0, 3, 1, 4, 2, 5)).reshape(z, t, h, w)[None]
    audio = output[video_token_num:video_token_num + audio_feat_len,
                   :audio_in_channels][None]
    return v, audio


class MagiHumanLatentPreparationStage(PipelineStage):
    """(reference stages/latent_preparation.py:103-240)."""

    def __init__(self, pipeline_config, transformer):
        self.cfg = pipeline_config
        self.transformer = transformer

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        cfg = self.cfg
        fps = int(getattr(cfg, "fps", 25))
        num_frames = int(batch.num_frames or 0)
        if num_frames <= 1:
            num_frames = 4 * fps + 1
        vt, vh, vw = getattr(cfg, "vae_stride", (4, 16, 16))
        z_dim = int(getattr(cfg, "z_dim", 48))
        vae_arch = getattr(cfg.vae_config, "arch_config", None)
        if vae_arch is not None:
            # follow the actually-loaded VAE geometry (covers tiny test
            # checkpoints; production matches the config defaults)
            z_dim = int(getattr(vae_arch, "z_dim", z_dim))
            vt = int(getattr(vae_arch, "scale_factor_temporal", vt))
            sp = int(getattr(vae_arch, "scale_factor_spatial", vh))
            vh = vw = sp
        arch = cfg.dit_config.arch_config
        pt, ph, pw = getattr(arch, "patch_size", (1, 2, 2))
        audio_ch = int(getattr(arch, "audio_in_channels", 64))
        latent_t = (num_frames - 1) // vt + 1
        latent_h = (int(batch.height or 256) // vh // ph) * ph
        latent_w = (int(batch.width or 480) // vw // pw) * pw
        batch.height = latent_h * vh
        batch.width = latent_w * vw
        batch.num_frames = num_frames

        video = randn_like_reference((1, z_dim, latent_t, latent_h,
                                      latent_w), [batch.seed or 0])
        audio = randn_like_reference((1, num_frames, audio_ch),
                                     [(batch.seed or 0) + 99])
        batch.latents = jnp.asarray(np.asarray(video, np.float32))
        batch.audio_latents = jnp.asarray(np.asarray(audio, np.float32))
        if batch.image_latent is not None:
            batch.latents = batch.latents.at[:, :, :1].set(
                batch.image_latent[:, :, :1].astype(jnp.float32))

        target_len = int(getattr(cfg, "t5_gemma_target_length", 640))

        def pad_or_trim(e):
            cur = e.shape[1]
            if cur < target_len:
                return (jnp.pad(e.astype(jnp.float32),
                                ((0, 0), (0, target_len - cur), (0, 0))),
                        cur)
            return e[:, :target_len].astype(jnp.float32), target_len

        lens = []
        for i, e in enumerate(batch.prompt_embeds):
            batch.prompt_embeds[i], orig = pad_or_trim(e)
            lens.append(orig)
        batch.extra["magi_text_lens"] = lens
        if batch.negative_prompt_embeds:
            neg_lens = []
            for i, e in enumerate(batch.negative_prompt_embeds):
                batch.negative_prompt_embeds[i], orig = pad_or_trim(e)
                neg_lens.append(orig)
            batch.extra["magi_neg_text_lens"] = neg_lens

        # step-invariant coords / modality layout (reference :318-380)
        coords_style = getattr(cfg, "coords_style", "v2")
        video_token_num = (latent_t // pt) * (latent_h // ph) * \
            (latent_w // pw)
        video_ref = (latent_t // pt, latent_h // ph, latent_w // pw)
        video_coords = _build_coords(video_ref, video_ref)
        if coords_style == "v2":
            audio_ref_t = (num_frames - 1) // _AUDIO_TEMPORAL_COMPRESSION + 1
            audio_coords = _build_coords((num_frames, 1, 1),
                                         (audio_ref_t // pt, 1, 1))
        else:
            audio_coords = _build_coords((num_frames, 1, 1),
                                         (latent_t // pt, 1, 1))
        batch.extra["magi_layout"] = dict(
            video_coords=video_coords, audio_coords=audio_coords,
            video_token_num=video_token_num, audio_feat_len=num_frames,
            max_ch=max(z_dim * pt * ph * pw, audio_ch),
            coords_style=coords_style,
            patch_size=(pt, ph, pw))
        return batch


class MagiHumanDenoisingStage(PipelineStage):
    """(reference stages/denoising.py:73-228)."""

    def __init__(self, transformer, scheduler, pipeline_config):
        self.transformer = transformer
        self.scheduler = scheduler
        self.cfg = pipeline_config
        self._step = None

    def _get_step(self):
        """Split once; per-(coords, mm) jitted steps are built in
        _dit_forward — the DiT consumes coords/modality as HOST values
        (it derives static masks from them), so they are closed over as
        constants rather than traced."""
        if self._step is None:
            self._step = nnx.split(self.transformer)
        return self._step

    def _get_jitted(self, graphdef, coords, mm):
        key = (coords.shape, mm.shape, coords.tobytes(), mm.tobytes())
        cache = getattr(self, "_jitted", None)
        if cache is None:
            cache = self._jitted = {}
        if key not in cache:
            @jax.jit
            def step(state, x):
                m = nnx.merge(graphdef, state)
                return m(x, coords, mm)

            cache[key] = step
        return cache[key]

    def _dit_forward(self, state, step, video, audio, txt, txt_len,
                     layout, batch, i):
        pt, ph, pw = layout["patch_size"]
        video_tokens = _img2tokens(video.astype(jnp.bfloat16), pt, ph)
        audio_tokens = audio[0].astype(jnp.bfloat16)
        text_tokens = txt[0, :txt_len].astype(jnp.bfloat16)
        max_ch = max(layout["max_ch"], text_tokens.shape[-1])

        def pad(t):
            return jnp.pad(t, ((0, 0), (0, max_ch - t.shape[-1])))

        x = jnp.concatenate(
            [pad(video_tokens), pad(audio_tokens), pad(text_tokens)])
        if layout["coords_style"] == "v2":
            text_coords = _build_coords((txt_len, 1, 1), (1, 1, 1),
                                        offset_thw=(-txt_len, 0, 0))
        else:
            text_coords = _build_coords((txt_len, 1, 1), (2, 1, 1))
        coords = np.concatenate([layout["video_coords"],
                                 layout["audio_coords"], text_coords])
        mm = np.concatenate([
            np.full(layout["video_token_num"], MODALITY_VIDEO, np.int64),
            np.full(layout["audio_feat_len"], MODALITY_AUDIO, np.int64),
            np.full(txt_len, MODALITY_TEXT, np.int64),
        ])
        graphdef = step  # callers unpack _get_step() as (graphdef, state)
        jitted = self._get_jitted(graphdef, coords, mm)
        with set_forward_context(current_timestep=i, forward_batch=batch):
            # one jitted XLA program per (coords, mm) layout — NOT eager
            # per-op dispatch, which costs a host round-trip per op
            out = jitted(state, x)
        arch = self.cfg.dit_config.arch_config
        return _unpack_tokens(out.astype(jnp.float32),
                              layout["video_token_num"],
                              layout["audio_feat_len"],
                              arch.video_in_channels,
                              arch.audio_in_channels,
                              tuple(video.shape), layout["patch_size"])

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        cfg = self.cfg
        shift = cfg.flow_shift or 5.0
        video_sched = copy.deepcopy(self.scheduler)
        audio_sched = copy.deepcopy(self.scheduler)
        video_sched.set_shift(shift)
        audio_sched.set_shift(shift)
        video_sched.set_timesteps(batch.num_inference_steps)
        audio_sched.set_timesteps(batch.num_inference_steps)
        timesteps = list(video_sched.timesteps)
        batch.timesteps = timesteps

        layout = batch.extra["magi_layout"]
        video = batch.latents.astype(jnp.float32)
        audio = batch.audio_latents.astype(jnp.float32)
        txt = batch.prompt_embeds[0]
        txt_len = int(batch.extra["magi_text_lens"][0])
        cfg_number = int(getattr(cfg, "cfg_number", 2))
        neg = neg_len = None
        if cfg_number == 2:
            if not batch.negative_prompt_embeds:
                raise ValueError("MagiHuman CFG=2 requires negative prompt "
                                 "embeddings")
            neg = batch.negative_prompt_embeds[0]
            neg_len = int(batch.extra["magi_neg_text_lens"][0])

        step, state = self._get_step()
        v_high = float(getattr(cfg, "video_txt_guidance_scale", 5.0))
        v_low = float(getattr(cfg, "video_guidance_low_t_value", 2.0))
        v_thresh = float(getattr(cfg, "video_guidance_high_t_threshold",
                                 500))
        a_scale = float(getattr(cfg, "audio_txt_guidance_scale", 5.0))
        for i, t in enumerate(timesteps):
            if batch.image_latent is not None:
                video = video.at[:, :, :1].set(
                    batch.image_latent[:, :, :1].astype(jnp.float32))
            vc, ac = self._dit_forward(state, step, video, audio, txt,
                                       txt_len, layout, batch, i)
            if cfg_number == 2:
                vu, au = self._dit_forward(state, step, video, audio, neg,
                                           neg_len, layout, batch, i)
                vg = v_high if float(t) > v_thresh else v_low
                v_pred = vu + vg * (vc - vu)
                a_pred = au + a_scale * (ac - au)
            else:
                v_pred, a_pred = vc, ac
            video = video_sched.step(v_pred, t, video).prev_sample.astype(
                jnp.float32)
            audio = audio_sched.step(a_pred, t, audio).prev_sample.astype(
                jnp.float32)
        if batch.image_latent is not None:
            video = video.at[:, :, :1].set(
                batch.image_latent[:, :, :1].astype(jnp.float32))
        batch.latents = video
        batch.audio_latents = audio
        return batch


class MagiHumanAudioDecodingStage(PipelineStage):
    """(reference stages/audio_decoding.py:61-111)."""

    def __init__(self, audio_vae):
        self.audio_vae = audio_vae

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        from scipy.signal import resample as scipy_resample

        latents = batch.audio_latents
        if latents is None:
            raise ValueError("MagiHuman audio decode requires audio latents")
        latent_bcl = jnp.transpose(latents, (0, 2, 1))
        audio = np.asarray(self.audio_vae.decode(
            latent_bcl.astype(jnp.float32)), np.float32)
        audio_np = audio[0].T  # [samples, channels]
        new_len = int(audio_np.shape[0] * _UPSTREAM_AUDIO_TIME_STRETCH)
        audio_np = np.asarray(scipy_resample(audio_np, new_len, axis=0),
                              np.float32)
        batch.extra["audio"] = audio_np
        batch.extra["audio_sample_rate"] = int(
            getattr(getattr(self.audio_vae, "config", None),
                    "sampling_rate", 44100))
        return batch


class MagiHumanPipeline(ComposedPipelineBase):
    """Base text-to-AV pipeline."""

    _required_config_modules = [
        "text_encoder", "tokenizer", "vae", "transformer", "scheduler",
        "audio_vae"
    ]

    def initialize_pipeline(self, fastvideo_args: FastVideoArgs) -> None:
        self.modules["scheduler"] = FlowUniPCMultistepScheduler()

    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        cfg = self.pipeline_config
        self.add_stage("input_validation_stage", InputValidationStage())
        self.add_stage(
            "prompt_encoding_stage",
            TextEncodingStage(
                text_encoders=[self.get_module("text_encoder")],
                tokenizers=[self.get_module("tokenizer")],
                max_length=int(getattr(cfg, "t5_gemma_target_length",
                                       640)),
            ))
        self.add_stage(
            "latent_preparation_stage",
            MagiHumanLatentPreparationStage(cfg,
                                            self.get_module("transformer")))
        self.add_stage(
            "denoising_stage",
            MagiHumanDenoisingStage(self.get_module("transformer"),
                                    self.get_module("scheduler"), cfg))
        self.add_stage("decoding_stage",
                       DecodingStage(self.get_module("vae"), cfg))
        self.add_stage("audio_decoding_stage",
                       MagiHumanAudioDecodingStage(
                           self.get_module("audio_vae")))


EntryClass = MagiHumanPipeline
