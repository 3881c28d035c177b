"""GEN3C camera-controlled 3D-cache video pipeline.

Behavioral reference: /root/reference/fastvideo/pipelines/basic/gen3c/
gen3c_pipeline.py + pipelines/stages/gen3c_stages.py (:25-721): the input
image is depth-unprojected into a 3D point cloud, forward-warped along a
generated camera trajectory, the warped frames + masks are VAE-encoded into
``condition_video_pose`` buffers, and the Cosmos-style EDM denoiser keeps
latent frame 0 pinned to the (noise-augmented) conditioning latent.

Depth provider: the reference lazily downloads the MoGe monocular-depth
model from the hub. This port accepts user depth via
``extra['gen3c_depth']`` ([H, W] array) and falls back to unit depth —
zero-egress analog of the repo's other weight-gated features (LPIPS/FVD);
a MoGe port can slot in behind the same key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.forward_context import set_forward_context
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.models.schedulers.flow_match_euler import (
    FlowMatchEulerDiscreteScheduler)
from fastvideo_tpu.pipelines.basic.gen3c.cache_3d import Cache3DBuffer
from fastvideo_tpu.pipelines.basic.gen3c.camera import (
    generate_camera_trajectory)
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.pipelines.composed import ComposedPipelineBase
from fastvideo_tpu.pipelines.stages.base import PipelineStage
from fastvideo_tpu.pipelines.stages.cosmos import (
    CosmosLatentPreparationStage)
from fastvideo_tpu.pipelines.stages.decoding import DecodingStage
from fastvideo_tpu.pipelines.stages.input_validation import (
    InputValidationStage)
from fastvideo_tpu.pipelines.stages.text_encoding import TextEncodingStage
from fastvideo_tpu.pipelines.stages.timestep_preparation import (
    TimestepPreparationStage)

logger = init_logger(__name__)


class Gen3CConditioningStage(PipelineStage):
    """Depth -> point cloud -> trajectory -> warped condition frames
    (reference gen3c_stages.py:56-208)."""

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        if batch.pil_image is None:
            logger.info("GEN3C: no input image; zero 3D-cache conditioning")
            return batch
        img = np.asarray(batch.pil_image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 127.5 - 1.0
        h, w = batch.height, batch.width
        if img.shape[:2] != (h, w):
            ih = (np.arange(h) * img.shape[0] / h).astype(int)
            iw = (np.arange(w) * img.shape[1] / w).astype(int)
            img = img[ih][:, iw]
        image = img.transpose(2, 0, 1)[None]  # [1, 3, H, W]

        depth = batch.extra.get("gen3c_depth")
        if depth is None:
            logger.warning(
                "GEN3C: no depth provided (extra['gen3c_depth']) and MoGe "
                "weights are unavailable offline; using unit depth")
            depth = np.ones((h, w), np.float32)
        depth = np.asarray(depth, np.float32).reshape(1, 1, h, w)

        fov_rad = np.deg2rad(60.0)
        f = 0.5 * w / np.tan(fov_rad / 2)
        intrinsics = np.asarray(
            [[[f, 0, w / 2.0], [0, f, h / 2.0], [0, 0, 1]]], np.float32)
        intrinsics = np.asarray(batch.extra.get("gen3c_intrinsics",
                                                intrinsics),
                                np.float32).reshape(1, 3, 3)
        w2c = np.eye(4, dtype=np.float32)[None]

        cfg = fastvideo_args.pipeline_config
        cache = Cache3DBuffer(
            input_image=image, input_depth=depth, input_w2c=w2c,
            input_intrinsics=intrinsics,
            frame_buffer_max=int(getattr(cfg, "frame_buffer_max", 2)),
            noise_aug_strength=float(
                getattr(cfg, "noise_aug_strength", 0.0)),
            filter_points_threshold=float(
                getattr(cfg, "filter_points_threshold", 0.05)),
            seed=batch.seed or 42)

        trajectory_type = batch.extra.get(
            "trajectory_type", getattr(cfg, "default_trajectory_type",
                                       "left"))
        movement_distance = float(batch.extra.get(
            "movement_distance",
            getattr(cfg, "default_movement_distance", 0.3)))
        camera_rotation = batch.extra.get(
            "camera_rotation", getattr(cfg, "default_camera_rotation",
                                       "center_facing"))
        w2cs, intrs = generate_camera_trajectory(
            trajectory_type, w2c[0], intrinsics[0],
            int(batch.num_frames), movement_distance, camera_rotation)
        warp_images, warp_masks = cache.render_cache(w2cs, intrs)
        batch.extra["rendered_warp_images"] = warp_images
        batch.extra["rendered_warp_masks"] = warp_masks
        batch.extra["input_image_conditioning"] = image[:, :, None]
        batch.extra["gen3c_cache"] = cache
        return batch


class Gen3CLatentPreparationStage(CosmosLatentPreparationStage):
    """Standard EDM noise + VAE-encoded warp buffers
    (reference gen3c_stages.py:210-477)."""

    def __init__(self, scheduler, transformer, vae, vae_config,
                 pipeline_config):
        super().__init__(scheduler, transformer, vae_config)
        self.vae = vae
        self.pipeline_config = pipeline_config
        self._encode = None

    def latent_shape(self, batch: ForwardBatch) -> tuple[int, ...]:
        z = self.transformer.config.in_channels
        # gen3c in_channels excludes the mask/pose condition blocks
        sf_s = 8
        if self.vae_config is not None:
            sf_s = self.vae_config.arch_config.scale_factor_spatial
        # the VAE may be the 8x-contract tokenizer adapter — ask it
        if hasattr(self.vae, "get_latent_num_frames"):
            nf = self.vae.get_latent_num_frames(batch.num_frames)
        else:
            sf_t = (self.vae_config.arch_config.scale_factor_temporal
                    if self.vae_config is not None else 4)
            nf = (batch.num_frames - 1) // sf_t + 1
        return (1, z, nf, batch.height // sf_s, batch.width // sf_s)

    def _vae_encode(self, x: jnp.ndarray) -> jnp.ndarray:
        if self._encode is None:
            graphdef, state = nnx.split(self.vae)

            @jax.jit
            def encode_fn(state, x):
                vae = nnx.merge(graphdef, state)
                # encode_latents is NCDHW on both the Wan VAE and the
                # tokenizer adapter (raw .encode layouts differ)
                z = vae.encode_latents(x)
                return vae.normalize_latents(z)

            self._encode = (encode_fn, state)
        encode_fn, state = self._encode
        return encode_fn(state, x)

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        super().forward(batch, fastvideo_args)
        b, z, nf, lh, lw = batch.latents.shape
        cfg = self.pipeline_config
        frame_buffer_max = int(getattr(cfg, "frame_buffer_max", 2))
        warp_images = batch.extra.get("rendered_warp_images")
        warp_masks = batch.extra.get("rendered_warp_masks")

        if warp_images is not None:
            masks_rgb = np.repeat(warp_masks * 2.0 - 1.0, 3, axis=3)
            latent_parts = []
            num_buffers = warp_images.shape[2]
            for i in range(num_buffers):
                img_in = jnp.asarray(
                    warp_images[:, :, i].transpose(0, 2, 1, 3, 4),
                    jnp.float32)
                mask_in = jnp.asarray(
                    masks_rgb[:, :, i].transpose(0, 2, 1, 3, 4),
                    jnp.float32)
                latent_parts.append(self._vae_encode(img_in))
                latent_parts.append(self._vae_encode(mask_in))
            for _ in range(frame_buffer_max - num_buffers):
                latent_parts.append(jnp.zeros_like(latent_parts[0]))
                latent_parts.append(jnp.zeros_like(latent_parts[1]))
            batch.extra["condition_video_pose"] = jnp.concatenate(
                latent_parts, axis=1)

            first = jnp.asarray(batch.extra["input_image_conditioning"],
                                jnp.float32)
            first_latent = self._vae_encode(first)
            cond_latents = jnp.zeros((b, z, nf, lh, lw), jnp.float32)
            cond_latents = cond_latents.at[:, :, :first_latent.shape[2]].set(
                first_latent[:, :z])
            batch.extra["conditioning_latents"] = cond_latents
        else:
            buffer_channels = frame_buffer_max * 2 * z
            batch.extra["condition_video_pose"] = jnp.zeros(
                (b, buffer_channels, nf, lh, lw), jnp.float32)
            batch.extra["conditioning_latents"] = None
        mask = jnp.zeros((b, 1, nf, lh, lw), jnp.float32)
        mask = mask.at[:, :, 0].set(1.0)
        batch.extra["condition_video_input_mask"] = mask
        batch.extra["cond_indicator"] = mask
        return batch


class Gen3CDenoisingStage(PipelineStage):
    """EDM-preconditioned denoise with conditioning-frame replacement
    (reference gen3c_stages.py:479-721)."""

    def __init__(self, transformer, scheduler, pipeline_config):
        self.transformer = transformer
        self.scheduler = scheduler
        self.pipeline_config = pipeline_config
        self._step = None

    def _get_step(self):
        if self._step is None:
            graphdef, state = nnx.split(self.transformer)

            @jax.jit
            def step(state, latents, ctx, t, cond_mask, cond_pose,
                     aug_sigma):
                m = nnx.merge(graphdef, state)
                return m(latents, t, ctx,
                         condition_video_input_mask=cond_mask,
                         condition_video_pose=cond_pose,
                         condition_video_augment_sigma=aug_sigma)

            self._step = (step, state)
        return self._step

    def forward(self, batch: ForwardBatch,
                fastvideo_args: FastVideoArgs) -> ForwardBatch:
        target_dtype = jnp.bfloat16
        cfg = self.pipeline_config
        latents = batch.latents.astype(jnp.float32)
        pos_ctx = batch.prompt_embeds[0].astype(target_dtype)
        neg_ctx = (batch.negative_prompt_embeds[0].astype(target_dtype)
                   if batch.negative_prompt_embeds else None)
        do_cfg = batch.do_classifier_free_guidance and neg_ctx is not None
        guidance = float(batch.guidance_scale)
        sigma_data = float(getattr(cfg, "sigma_data", 0.5))
        aug_sigma_val = float(getattr(cfg, "sigma_conditional", 0.001))

        self.scheduler.set_timesteps(batch.num_inference_steps)
        sigmas = np.asarray(self.scheduler.sigmas, np.float64)
        if (getattr(self.scheduler, "final_sigmas_type", "sigma_min")
                == "sigma_min" and len(sigmas) > 1):
            sigmas[-1] = sigmas[-2]
            self.scheduler.sigmas = sigmas.astype(np.float32)
        timesteps = np.asarray(self.scheduler.timesteps)
        batch.timesteps = timesteps

        cond_mask = batch.extra["condition_video_input_mask"].astype(
            target_dtype)
        cond_pose = batch.extra["condition_video_pose"].astype(target_dtype)
        cond_latents = batch.extra.get("conditioning_latents")
        indicator = batch.extra.get("cond_indicator")
        aug_sigma = jnp.full((latents.shape[0],), aug_sigma_val,
                             jnp.float32)
        rng = np.random.default_rng((batch.seed or 0) + 31)
        if cond_latents is not None:
            aug_noise = jnp.asarray(
                rng.standard_normal(cond_latents.shape), jnp.float32)
            augment_latent = cond_latents + aug_noise * aug_sigma_val
            c_in_aug = 1.0 / (aug_sigma_val**2 + sigma_data**2)**0.5
            augment_latent = augment_latent * c_in_aug

        step, state = self._get_step()
        b = latents.shape[0]
        for i, t in enumerate(timesteps):
            sigma = float(sigmas[i])
            c_in = 1.0 / (sigma**2 + sigma_data**2)**0.5
            c_skip = sigma_data**2 / (sigma**2 + sigma_data**2)
            c_out = sigma * sigma_data / (sigma**2 + sigma_data**2)**0.5
            xt = latents
            if cond_latents is not None and aug_sigma_val < sigma:
                # replace conditioning frames with the (unscaled-back)
                # augmented clean latent (reference :524-555)
                replace = augment_latent / c_in
                xt = indicator * replace + (1 - indicator) * xt
            t_arr = jnp.full((b,), float(t), jnp.float32)
            model_in = (xt * c_in).astype(target_dtype)
            with set_forward_context(current_timestep=i,
                                     forward_batch=batch):
                pred = step(state, model_in, pos_ctx, t_arr, cond_mask,
                            cond_pose, aug_sigma).astype(jnp.float32)
                cond_x0 = c_skip * xt + c_out * pred
                if do_cfg:
                    upred = step(state, model_in, neg_ctx, t_arr, cond_mask,
                                 cond_pose, aug_sigma).astype(jnp.float32)
                    uncond_x0 = c_skip * xt + c_out * upred
                    final_x0 = cond_x0 + guidance * (cond_x0 - uncond_x0)
                else:
                    final_x0 = cond_x0
            velocity = (xt - final_x0) / max(sigma, 1e-6)
            latents = self.scheduler.step(
                velocity, float(t),
                xt.astype(jnp.float32)).prev_sample.astype(jnp.float32)
        batch.latents = latents
        return batch


class Gen3CPipeline(ComposedPipelineBase):
    _required_config_modules = [
        "text_encoder", "tokenizer", "vae", "transformer", "scheduler"
    ]

    def initialize_pipeline(self, fastvideo_args: FastVideoArgs) -> None:
        self.modules["scheduler"] = FlowMatchEulerDiscreteScheduler(
            shift=self.pipeline_config.flow_shift or 1.0,
            use_karras_sigmas=True, sigma_max=80.0, sigma_min=0.0002,
            sigma_data=float(getattr(self.pipeline_config, "sigma_data",
                                     0.5)),
            final_sigmas_type="sigma_min")
        # GEN3C diffusion operates at 8x temporal compression while the
        # bundled tokenizer/VAE is a 4x model — wrap it with the temporal
        # adapter (reference models/vaes/gen3c_tokenizer_vae.py:157-366).
        target_tc = int(getattr(self.pipeline_config,
                                "target_temporal_compression", 8))
        vae = self.get_module("vae")
        inner_tc = int(getattr(vae.config, "scale_factor_temporal",
                               target_tc) or target_tc)
        if target_tc != inner_tc:
            from fastvideo_tpu.models.vaes.gen3c_tokenizer_vae import (
                AutoencoderKLGen3CTokenizer)

            self.modules["vae"] = AutoencoderKLGen3CTokenizer(
                vae, inner_temporal_compression=inner_tc,
                target_temporal_compression=target_tc)

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
        self.add_stage("conditioning_stage", Gen3CConditioningStage())
        self.add_stage("timestep_preparation_stage",
                       TimestepPreparationStage(self.get_module("scheduler"),
                                                cfg))
        self.add_stage(
            "latent_preparation_stage",
            Gen3CLatentPreparationStage(self.get_module("scheduler"),
                                        self.get_module("transformer"),
                                        self.get_module("vae"),
                                        cfg.vae_config, cfg))
        self.add_stage(
            "denoising_stage",
            Gen3CDenoisingStage(self.get_module("transformer"),
                                self.get_module("scheduler"), cfg))
        self.add_stage("decoding_stage",
                       DecodingStage(self.get_module("vae"), cfg))


EntryClass = Gen3CPipeline
