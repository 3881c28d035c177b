"""MiniMax-H3 joint video + stereo-audio pipeline (T2VA / FL2VA).

Behavioral reference: /root/reference/fastvideo/pipelines/basic/minimax_h3/
(minimax_h3_pipeline.py + stages/): one packed padless document
``[text | keyframe condition rows | audio rows | video rows]`` is denoised
by a single transformer with per-row timesteps — the video and audio
modalities run *different* flow schedules (shift 12 vs 3) inside the same
forward, condition rows are pinned nearly clean (noise-aug 0.999), and the
velocities are split back out per modality for separate scheduler steps.

TPU shape: the packed layout is host-side numpy (static per request
geometry), so every jitted transformer call sees static gather indices;
the denoise loop dispatches one XLA program per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.forward_context import set_forward_context
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.pipelines.basic.minimax_h3 import packing
from fastvideo_tpu.pipelines.basic.minimax_h3.packing import (
    MINIMAX_H3_AUDIO_CHANNELS, MINIMAX_H3_CANVAS_MULTIPLE, MINIMAX_H3_FPS,
    MINIMAX_H3_KEYFRAME_ENCODE_SEED, MINIMAX_H3_KEYFRAME_NOISE_AUG,
    MINIMAX_H3_MAX_DURATION, MINIMAX_H3_MIN_DURATION, MINIMAX_H3_TEXT_TAG,
    MiniMaxH3PackedLayout, align_num_frames, audio_latent_num_frames,
    build_packed_sequence, build_row_timesteps, patchify_video_latents,
    resolve_canvas_size, unpack_audio_tokens, unpatchify_video_tokens,
    video_latent_num_frames)
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.composed import ComposedPipelineBase
from fastvideo_tpu.pipelines.stages.base import PipelineStage
from fastvideo_tpu.pipelines.stages.latent_preparation import (
    randn_like_reference)

logger = init_logger(__name__)

Array = jax.Array

LAYOUT_KEY = "minimax_h3_layout"
KEYFRAMES_KEY = "minimax_h3_keyframes"
KEYFRAME_ANCHORS_KEY = "minimax_h3_keyframe_anchors"
TEXT_TOKEN_TAGS_KEY = "minimax_h3_text_token_tags"


class MiniMaxH3InputPreparationStage(PipelineStage):
    """One-request, no-CFG contract + canvas/frame alignment
    (reference stages/minimax_h3_input_preparation.py:57-228)."""

    def __init__(self, vae):
        self.vae = vae

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if not isinstance(batch.prompt, str):
            raise ValueError("MiniMax-H3 packs one request; prompt must be "
                             "a single string")
        if batch.negative_prompt and str(batch.negative_prompt).strip():
            raise ValueError("MiniMax-H3 is guidance-distilled and does "
                             "not accept a negative prompt")
        if batch.guidance_scale != 1.0:
            raise ValueError("MiniMax-H3 does not support CFG; "
                             "guidance_scale must be 1.0")
        if batch.num_inference_steps < 2:
            raise ValueError("MiniMax-H3 needs >= 2 sigma grid points")
        batch.fps = MINIMAX_H3_FPS

        keyframes = []
        anchors = []
        if batch.pil_image is not None:
            keyframes.append(np.asarray(batch.pil_image))
            anchors.append("first")
        if batch.last_image is not None:
            keyframes.append(np.asarray(batch.last_image))
            anchors.append("last")

        if batch.height is None or batch.width is None:
            if keyframes:
                h0, w0 = keyframes[0].shape[:2]
                height, width = resolve_canvas_size(w0, h0)
            else:
                height, width = resolve_canvas_size(16, 9)
        else:
            height, width = batch.height, batch.width
            if (height % MINIMAX_H3_CANVAS_MULTIPLE or
                    width % MINIMAX_H3_CANVAS_MULTIPLE):
                raise ValueError(
                    f"height/width must be multiples of "
                    f"{MINIMAX_H3_CANVAS_MULTIPLE}, got {height}x{width}")
        ratio = self.vae.spatial_compression_ratio
        num_frames = align_num_frames(batch.num_frames)
        duration = num_frames / MINIMAX_H3_FPS
        if not MINIMAX_H3_MIN_DURATION <= duration <= MINIMAX_H3_MAX_DURATION:
            raise ValueError(
                f"MiniMax-H3 generates {MINIMAX_H3_MIN_DURATION:g}-"
                f"{MINIMAX_H3_MAX_DURATION:g}s at {MINIMAX_H3_FPS} fps; "
                f"aligned num_frames={num_frames}")

        batch.height, batch.width = height, width
        batch.num_frames = num_frames
        batch.height_latents = height // ratio
        batch.width_latents = width // ratio
        batch.raw_latent_shape = (1, self.vae.latent_channels,
                                  video_latent_num_frames(num_frames),
                                  height // ratio, width // ratio)
        # resize keyframes to the canvas (nearest; reference uses LANCZOS —
        # conditioning tolerance, host-side)
        sized = []
        for img in keyframes:
            ih = (np.arange(height) * img.shape[0] / height).astype(int)
            iw = (np.arange(width) * img.shape[1] / width).astype(int)
            sized.append(img[ih][:, iw])
        batch.extra[KEYFRAMES_KEY] = sized
        batch.extra[KEYFRAME_ANCHORS_KEY] = tuple(anchors)
        return batch


class MiniMaxH3ConditioningStage(PipelineStage):
    """Qwen3-VL hidden_states[50] conditioning with token tags
    (reference stages/minimax_h3_conditioning.py:125-322)."""

    def __init__(self, conditioner, tokenizer, processor=None):
        self.conditioner = conditioner
        self.tokenizer = tokenizer
        self.processor = processor

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        cfg = self.conditioner.config
        layer = packing.MINIMAX_H3_TEXT_ENCODER_LAYER
        if cfg.num_hidden_layers <= layer:
            # tiny test checkpoints have few layers; read the deepest
            # available stream and log the deviation once
            layer = cfg.num_hidden_layers
        images = batch.extra.get(KEYFRAMES_KEY, [])

        token_ids: list[int] = []
        token_tags: list[int] = []
        pixel_values = None
        image_grid_thw = None
        if images:
            if self.processor is None:
                raise ValueError(
                    "MiniMax-H3 keyframe conditioning needs the Qwen3-VL "
                    "processor component")
            from PIL import Image
            pil = [Image.fromarray(np.asarray(img)) for img in images]
            vision = self.processor.image_processor(images=pil,
                                                    return_tensors="np")
            pixel_values = np.asarray(vision["pixel_values"])
            image_grid_thw = np.asarray(vision["image_grid_thw"])
            merge_area = int(self.processor.image_processor.merge_size) ** 2
            vs = int(self.tokenizer.convert_tokens_to_ids(
                packing.MINIMAX_H3_VISION_START_TOKEN))
            pad = int(self.tokenizer.convert_tokens_to_ids(
                packing.MINIMAX_H3_IMAGE_PAD_TOKEN))
            ve = int(self.tokenizer.convert_tokens_to_ids(
                packing.MINIMAX_H3_VISION_END_TOKEN))
            for index in range(len(images)):
                n_img = int(np.prod(image_grid_thw[index])) // merge_area
                label = self.tokenizer(f"<Picture {index + 1}>: ",
                                       add_special_tokens=False)["input_ids"]
                vision_ids = [vs] + [pad] * n_img + [ve]
                token_ids.extend(int(t) for t in label)
                token_ids.extend(vision_ids)
                token_tags.extend([MINIMAX_H3_TEXT_TAG] * len(label))
                token_tags.extend([packing.MINIMAX_H3_VIDEO_TAG] *
                                  len(vision_ids))

        prompt_ids = self.tokenizer(batch.prompt,
                                    add_special_tokens=False)["input_ids"]
        token_ids.extend(int(t) for t in prompt_ids)
        token_tags.extend([MINIMAX_H3_TEXT_TAG] * len(prompt_ids))

        out = self.conditioner(
            np.asarray([token_ids], np.int64),
            pixel_values=None if pixel_values is None
            else jnp.asarray(pixel_values),
            image_grid_thw=image_grid_thw, output_hidden_states=True)
        batch.prompt_embeds = [out.hidden_states[layer]]
        batch.extra[TEXT_TOKEN_TAGS_KEY] = np.asarray(token_tags, np.int64)
        return batch


class MiniMaxH3LatentPreparationStage(PipelineStage):
    """Keyframe VAE-encode + packed layout + target noise
    (reference stages/minimax_h3_latent_preparation.py:57-337)."""

    def __init__(self, transformer, vae, audio_vae, scheduler):
        self.transformer = transformer
        self.vae = vae
        self.audio_vae = audio_vae
        self.scheduler = scheduler

    def _encode_keyframes(self, batch: ForwardBatch):
        keyframes = batch.extra.get(KEYFRAMES_KEY, [])
        if not keyframes:
            return None
        patch_size = self.transformer.patch_size
        mean = np.asarray(self.vae.config.latents_mean,
                          np.float32).reshape(1, -1, 1, 1, 1)
        std = np.asarray(self.vae.config.latents_std,
                         np.float32).reshape(1, -1, 1, 1, 1)
        clean_rows = []
        key = jax.random.PRNGKey(MINIMAX_H3_KEYFRAME_ENCODE_SEED)
        for image in keyframes:
            pixels = np.asarray(image, np.float32) / 255.0
            pixels = pixels.transpose(2, 0, 1)[None, :, None]  # [1,C,1,H,W]
            posterior = self.vae.encode_keyframe(
                self.vae.normalize_pixels(jnp.asarray(pixels)))
            key, sub = jax.random.split(key)
            latents = np.asarray(posterior.sample(sub), np.float32)
            clean_rows.append(
                patchify_video_latents((latents - mean) / std, patch_size))
        clean = jnp.asarray(np.concatenate(clean_rows))
        lh, lw = batch.height_latents, batch.width_latents
        zc = self.vae.latent_channels
        noise_rows = []
        for i in range(len(keyframes)):
            noise = randn_like_reference((1, zc, 1, lh, lw),
                                         [(batch.seed or 0) + 1000 + i])
            noise_rows.append(
                patchify_video_latents(np.asarray(noise, np.float32),
                                       self.transformer.patch_size))
        noise = jnp.asarray(np.concatenate(noise_rows))
        return self.scheduler.scale_noise(clean,
                                          MINIMAX_H3_KEYFRAME_NOISE_AUG,
                                          noise)

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        condition_video = self._encode_keyframes(batch)

        tags = batch.extra[TEXT_TOKEN_TAGS_KEY]
        _, zc, num_latent_frames, lh, lw = batch.raw_latent_shape
        num_audio_latents = audio_latent_num_frames(batch.num_frames)
        layout = build_packed_sequence(
            tags, num_latent_frames, lh, lw, num_audio_latents,
            self.transformer.patch_size,
            batch.extra.get(KEYFRAME_ANCHORS_KEY, ()))

        video_noise = np.asarray(
            randn_like_reference((1, zc, num_latent_frames, lh, lw),
                                 [batch.seed or 0]), np.float32)
        video_rows = jnp.asarray(
            patchify_video_latents(video_noise, self.transformer.patch_size))
        audio_channels = self.audio_vae.latent_channels
        audio_rows = jnp.asarray(np.asarray(randn_like_reference(
            (1, num_audio_latents * MINIMAX_H3_AUDIO_CHANNELS,
             audio_channels), [(batch.seed or 0) + 777]), np.float32)[0])

        if condition_video is not None:
            video_rows = jnp.concatenate([condition_video, video_rows])
        if video_rows.shape[0] != len(layout.video_indices):
            raise ValueError("packed video row count mismatch")
        if audio_rows.shape[0] != len(layout.audio_indices):
            raise ValueError("packed audio row count mismatch")
        batch.latents = video_rows
        batch.audio_latents = audio_rows
        batch.extra[LAYOUT_KEY] = layout
        return batch


class MiniMaxH3DenoisingStage(PipelineStage):
    """One transformer forward denoises both modalities per step
    (reference stages/minimax_h3_denoising.py:58-155)."""

    def __init__(self, transformer, scheduler, audio_scheduler):
        self.transformer = transformer
        self.scheduler = scheduler
        self.audio_scheduler = audio_scheduler

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        layout: MiniMaxH3PackedLayout = batch.extra[LAYOUT_KEY]
        self.scheduler.set_timesteps(batch.num_inference_steps)
        self.audio_scheduler.set_timesteps(batch.num_inference_steps)
        video_timesteps = self.scheduler.timesteps
        audio_timesteps = self.audio_scheduler.timesteps
        if len(video_timesteps) != len(audio_timesteps):
            raise ValueError("video/audio schedules must align")
        batch.timesteps = video_timesteps

        position_ids = jnp.asarray(layout.position_ids, jnp.float32)
        token_tags = jnp.asarray(layout.token_tags)
        video_indices = jnp.asarray(layout.video_indices)
        audio_indices = jnp.asarray(layout.audio_indices)
        text_indices = jnp.asarray(layout.text_indices)
        embeds = batch.prompt_embeds[0]

        latents = batch.latents
        audio_latents = batch.audio_latents
        n_cond_v = layout.num_condition_video_rows
        n_cond_a = layout.num_condition_audio_rows
        for i, (vt, at) in enumerate(zip(video_timesteps, audio_timesteps)):
            unique, inverse = build_row_timesteps(
                layout, float(vt), float(at),
                max(float(vt), MINIMAX_H3_KEYFRAME_NOISE_AUG), 1.0)
            with set_forward_context(current_timestep=i,
                                     forward_batch=batch):
                video_v, audio_v = self.transformer(
                    latents[None].astype(jnp.bfloat16),
                    audio_latents[None].astype(jnp.bfloat16),
                    embeds.astype(jnp.bfloat16),
                    jnp.asarray(unique, jnp.float32),
                    jnp.asarray(inverse), token_tags, position_ids,
                    video_indices, audio_indices, text_indices)
            latents = latents.at[n_cond_v:].set(self.scheduler.step(
                video_v[0, n_cond_v:].astype(jnp.float32), float(vt),
                latents[n_cond_v:].astype(jnp.float32)).prev_sample)
            audio_latents = audio_latents.at[n_cond_a:].set(
                self.audio_scheduler.step(
                    audio_v[0, n_cond_a:].astype(jnp.float32), float(at),
                    audio_latents[n_cond_a:].astype(
                        jnp.float32)).prev_sample)
        batch.latents = latents
        batch.audio_latents = audio_latents
        return batch


class MiniMaxH3VideoDecodingStage(PipelineStage):
    """Drop condition rows, unpatchify, decode
    (reference stages/minimax_h3_decoding.py:33-86)."""

    def __init__(self, vae, transformer):
        self.vae = vae
        self.transformer = transformer

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        layout: MiniMaxH3PackedLayout = batch.extra[LAYOUT_KEY]
        _, channels, num_frames, lh, lw = batch.raw_latent_shape
        rows = np.asarray(batch.latents[layout.num_condition_video_rows:],
                          np.float32)
        latents = unpatchify_video_tokens(rows, num_frames, lh, lw,
                                          channels,
                                          self.transformer.patch_size)
        latents = self.vae.denormalize_latents(jnp.asarray(latents))
        if batch.extra.get("output_type") == "latent":
            batch.output = latents
            return batch
        video = self.vae.decode(latents)
        video = jnp.clip(self.vae.denormalize_pixels(video), 0.0, 1.0)
        # the framework postprocess expects [-1, 1]
        batch.output = video * 2.0 - 1.0
        return batch


class MiniMaxH3AudioDecodingStage(PipelineStage):
    """Reference stages/minimax_h3_decoding.py:89-150."""

    def __init__(self, audio_vae):
        self.audio_vae = audio_vae

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        layout: MiniMaxH3PackedLayout = batch.extra[LAYOUT_KEY]
        rows = np.asarray(
            batch.audio_latents[layout.num_condition_audio_rows:],
            np.float32)
        latents = unpack_audio_tokens(rows, layout.num_audio_latents)
        latents = self.audio_vae.denormalize_latents(latents)
        if batch.extra.get("output_type") == "latent":
            batch.extra["audio"] = latents
            batch.extra["audio_sample_rate"] = self.audio_vae.sampling_rate
            return batch
        decoded = np.asarray(self.audio_vae.decode(jnp.asarray(latents)),
                             np.float32)
        if decoded.ndim != 3 or decoded.shape[0] != 2 or \
                decoded.shape[1] != 1:
            raise ValueError(
                f"audio VAE must decode stereo as two mono batch items; "
                f"got {decoded.shape}")
        batch.extra["audio"] = decoded[:, 0].T  # [samples, 2]
        batch.extra["audio_sample_rate"] = self.audio_vae.sampling_rate
        return batch


class MiniMaxH3Pipeline(ComposedPipelineBase):
    """T2VA / FL2VA joint video + stereo-audio generation."""

    _required_config_modules = [
        "text_encoder", "tokenizer", "processor", "vae", "audio_vae",
        "transformer", "scheduler", "audio_scheduler"
    ]

    def initialize_pipeline(self, fastvideo_args: FastVideoArgs) -> None:
        for name, expected in (("scheduler", 12.0),
                               ("audio_scheduler", 3.0)):
            shift = getattr(self.get_module(name), "shift", None)
            if shift is None or float(shift) != expected:
                raise ValueError(
                    f"MiniMax-H3 {name} must expose shift={expected:g}, "
                    f"got {shift}")

    def create_pipeline_stages(self, fastvideo_args: FastVideoArgs) -> None:
        vae = self.get_module("vae")
        audio_vae = self.get_module("audio_vae")
        transformer = self.get_module("transformer")
        self.add_stage("input_preparation_stage",
                       MiniMaxH3InputPreparationStage(vae))
        self.add_stage(
            "conditioning_stage",
            MiniMaxH3ConditioningStage(self.get_module("text_encoder"),
                                       self.get_module("tokenizer"),
                                       self.get_module("processor")))
        self.add_stage(
            "latent_preparation_stage",
            MiniMaxH3LatentPreparationStage(transformer, vae, audio_vae,
                                            self.get_module("scheduler")))
        self.add_stage(
            "denoising_stage",
            MiniMaxH3DenoisingStage(transformer,
                                    self.get_module("scheduler"),
                                    self.get_module("audio_scheduler")))
        self.add_stage("video_decoding_stage",
                       MiniMaxH3VideoDecodingStage(vae, transformer))
        self.add_stage("audio_decoding_stage",
                       MiniMaxH3AudioDecodingStage(audio_vae))


class MiniMaxH3ModularPipeline(MiniMaxH3Pipeline):
    """Public entry matching the official manifest class name."""


EntryClass = MiniMaxH3ModularPipeline
