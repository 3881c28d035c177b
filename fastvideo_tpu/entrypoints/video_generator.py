"""VideoGenerator: the user-facing façade.

Analog of /root/reference/fastvideo/entrypoints/video_generator.py:149-1327:
from_pretrained/from_fastvideo_args construction, generate_video with
SamplingParam/kwargs, latent->pixel postprocess and mp4 writing.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any

import numpy as np

from fastvideo_tpu.configs.sample import SamplingParam
from fastvideo_tpu.fastvideo_args import FastVideoArgs
from fastvideo_tpu.logger import init_logger
from fastvideo_tpu.pipelines.batch import ForwardBatch
from fastvideo_tpu.registry import get_pipeline_config_cls_for_name
from fastvideo_tpu.worker.executor import Executor

logger = init_logger(__name__)


class VideoGenerator:
    def __init__(self, fastvideo_args: FastVideoArgs, executor: Executor):
        self.fastvideo_args = fastvideo_args
        self.executor = executor

    # -- construction ------------------------------------------------------

    @classmethod
    def from_pretrained(cls, model_path: str, *, num_gpus: int = 1,
                        **kwargs) -> "VideoGenerator":
        config_cls = get_pipeline_config_cls_for_name(model_path)
        if config_cls is None:
            from fastvideo_tpu.configs.pipelines.wan import WanT2V480PConfig

            logger.warning("No registered pipeline config for %s; "
                           "defaulting to Wan T2V", model_path)
            config_cls = WanT2V480PConfig
        pipeline_config = config_cls(model_path=model_path)
        pc_fields = {f.name for f in dataclasses.fields(pipeline_config)}
        for k in list(kwargs):
            if k in pc_fields:
                setattr(pipeline_config, k, kwargs.pop(k))
        args = FastVideoArgs.from_kwargs(model_path=model_path,
                                         num_gpus=num_gpus, **kwargs)
        args.pipeline_config = pipeline_config
        return cls.from_fastvideo_args(args)

    @classmethod
    def from_fastvideo_args(cls,
                            fastvideo_args: FastVideoArgs) -> "VideoGenerator":
        executor_cls = Executor.get_class(fastvideo_args)
        return cls(fastvideo_args, executor_cls(fastvideo_args))

    @classmethod
    def from_config(cls, config) -> "VideoGenerator":
        """Construct from a typed ``api.GeneratorConfig`` or a plain mapping
        (drop-in for reference entrypoints/video_generator.py:240)."""
        from fastvideo_tpu.api.parser import parse_dataclass
        from fastvideo_tpu.api.schema import GeneratorConfig

        if not isinstance(config, GeneratorConfig):
            config = parse_dataclass(GeneratorConfig, dict(config))
        return cls.from_generator_config(config)

    @classmethod
    def from_file(cls, path: str,
                  overrides: dict[str, Any] | list[str] | None = None
                  ) -> "VideoGenerator":
        """Construct from a JSON/YAML generator-config file (drop-in for
        reference entrypoints/video_generator.py:255). ``overrides`` are
        dotted-key assignments (dict or ``["a.b=c", ...]`` list) applied on
        top of the file before parsing."""
        from fastvideo_tpu.api.parser import load_config_file
        from fastvideo_tpu.api.schema import GeneratorConfig

        if not overrides:
            return cls.from_generator_config(
                load_config_file(GeneratorConfig, path))
        import dataclasses as _dc

        cfg = load_config_file(GeneratorConfig, path)
        if isinstance(overrides, list):
            parsed: dict[str, Any] = {}
            for item in overrides:
                key, _, val = item.partition("=")
                parsed[key.strip()] = val.strip()
            overrides = parsed
        for dotted, value in overrides.items():
            key = dotted[len("generator."):] if dotted.startswith(
                "generator.") else dotted
            parts = key.split(".")
            obj = cfg
            for p in parts[:-1]:
                obj = getattr(obj, p)
                if not _dc.is_dataclass(obj):
                    raise KeyError(
                        f"config override path {dotted!r} crosses "
                        f"non-config field {p!r}")
            leaf = parts[-1]
            field_types = {f.name: f.type for f in _dc.fields(obj)}
            if leaf not in field_types:
                raise KeyError(f"unknown config override: {dotted}")
            # coerce by the DECLARED type: "42" stays a string for str
            # fields (model revisions, prompts), becomes 42 for int ones
            declared = str(field_types[leaf])
            if isinstance(value, str) and "str" not in declared:
                from fastvideo_tpu.api.parser import _coerce_scalar

                value = _coerce_scalar(value)
            setattr(obj, leaf, value)
        return cls.from_generator_config(cfg)

    @classmethod
    def from_generator_config(cls, config) -> "VideoGenerator":
        """Construct from a typed api.GeneratorConfig tree."""
        eng = config.engine
        par = eng.parallelism
        kwargs: dict[str, Any] = {"num_gpus": eng.num_gpus}
        if par.sp_size and par.sp_size > 0:
            kwargs["sp_size"] = par.sp_size
        if par.tp_size and par.tp_size > 0:
            kwargs["tp_size"] = par.tp_size
        if getattr(par, "dp_size", None) and par.dp_size > 0:
            kwargs["dp_size"] = par.dp_size
        if config.pipeline.components.lora_path:
            kwargs["lora_path"] = config.pipeline.components.lora_path
        if eng.quantization and eng.quantization.transformer_quant:
            kwargs["transformer_quant"] = eng.quantization.transformer_quant
        gen = cls.from_pretrained(config.model_path, **kwargs)
        gen.generator_config = config
        return gen

    def generate(self, request) -> dict[str, Any] | list[np.ndarray]:
        """Run a typed api.GenerationRequest (preset-aware)."""
        from fastvideo_tpu.api.parser import effective_explicit_paths
        from fastvideo_tpu.api.presets import (get_preset,
                                               validate_stage_overrides)
        from fastvideo_tpu.api.schema import generation_kwargs

        kwargs = generation_kwargs(request)
        cfg = getattr(self, "generator_config", None)
        if cfg is not None and cfg.pipeline.preset:
            pipe_cfg = self.fastvideo_args.pipeline_config
            family = (pipe_cfg.model_family if pipe_cfg is not None
                      else "wan")
            preset = get_preset(family, cfg.pipeline.preset,
                                cfg.pipeline.preset_version)
            validate_stage_overrides(preset, request.stage_overrides)
            # preset defaults apply only where the request didn't set
            # the field explicitly (schema.ServeConfig precedence).
            # Preset keys can live at the top level (negative_prompt),
            # under sampling.*, or under runtime.* — check all; and
            # programmatic requests (no parse_dataclass record) fall
            # back to a diff-vs-defaults explicit set.
            explicit = effective_explicit_paths(request)
            for key, value in {**preset.defaults,
                               **cfg.pipeline.preset_overrides}.items():
                if any(p in explicit for p in (
                        key, f"sampling.{key}", f"runtime.{key}",
                        f"inputs.{key}", f"output.{key}")):
                    continue
                kwargs[key] = value
            for overrides in request.stage_overrides.values():
                kwargs.update(overrides)
        return self.generate_video(prompt=request.prompt, **kwargs)

    # -- generation --------------------------------------------------------

    def generate_video(
        self,
        prompt: str | list[str] | None = None,
        sampling_param: SamplingParam | None = None,
        **kwargs,
    ) -> dict[str, Any] | list[np.ndarray]:
        t0 = time.perf_counter()
        param = sampling_param or SamplingParam.from_pretrained(
            self.fastvideo_args.model_path)
        if prompt is not None:
            kwargs["prompt"] = prompt
        param.update(kwargs)

        pipeline_config = self.fastvideo_args.pipeline_config
        dmd_steps = None
        if pipeline_config is not None:
            dmd_steps = pipeline_config.dmd_denoising_steps
        if param.dmd_denoising_steps is not None:
            dmd_steps = param.dmd_denoising_steps

        batch = ForwardBatch(
            prompt=param.prompt,
            negative_prompt=param.negative_prompt,
            output_path=param.output_path,
            output_video_name=param.output_video_name,
            image_path=param.image_path,
            video_path=(param.video_path if isinstance(
                param.video_path, str) else (param.video_path or [None])[0]),
            pil_image=param.pil_image,
            height=param.height,
            width=param.width,
            num_frames=param.num_frames,
            fps=param.fps,
            seed=param.seed,
            num_inference_steps=param.num_inference_steps,
            guidance_scale=param.guidance_scale,
            guidance_rescale=param.guidance_rescale,
            dmd_denoising_steps=dmd_steps,
            height_sr=param.height_sr,
            width_sr=param.width_sr,
            num_inference_steps_sr=param.num_inference_steps_sr or 10,
            save_video=param.save_video,
            return_frames=param.return_frames,
            return_trajectory_latents=param.return_trajectory_latents,
            extra=dict(param.extra),
        )
        batch.extra["num_videos_per_prompt"] = param.num_videos_per_prompt
        if param.extra.get("sigmas") is not None:
            # custom scheduler sigmas (consumed by TimestepPreparationStage)
            batch.sigmas = np.asarray(param.extra["sigmas"], np.float64)

        batch = self.executor.execute_forward(batch, self.fastvideo_args)

        frames = None
        if batch.output is not None:
            if hasattr(batch.output, "devices"):
                # quantize to uint8 ON DEVICE: 4x less device->host traffic
                # than fetching fp32 pixels (the fetch dominates on slow
                # transports; identical numerics to _postprocess).
                import jax.numpy as jnp
                u8 = jnp.round(
                    (jnp.clip(batch.output, -1, 1) + 1) * 127.5).astype(
                        jnp.uint8)
                video = np.asarray(u8)
                frames = [v.transpose(1, 2, 3, 0) for v in video]
            else:
                frames = self._postprocess(np.asarray(batch.output))
        gen_time = time.perf_counter() - t0

        result: dict[str, Any] = {
            "prompts": param.prompt,
            "generation_time": gen_time,
            "stage_times": batch.logging_info.stage_times,
        }
        if batch.return_trajectory_latents:
            result["trajectory_latents"] = batch.trajectory_latents
            result["trajectory_timesteps"] = batch.trajectory_timesteps
        if frames is not None:
            result["frames"] = frames
            if param.save_video:
                path = self._save_video(frames[0], param)
                result["video_path"] = path
        if batch.extra.get("audio") is not None:
            # audio families (Stable Audio; LTX-2 joint AV) put a
            # [samples, channels] float waveform on batch.extra
            result["audio"] = batch.extra["audio"]
            result["audio_sample_rate"] = batch.extra.get(
                "audio_sample_rate", 44100)
            if param.save_video:
                result["audio_path"] = self._save_wav(
                    batch.extra["audio"], result["audio_sample_rate"],
                    param)
        result["latents"] = batch.latents
        logger.info("Generated video in %.2fs (stages: %s)", gen_time,
                    {k: round(v, 3)
                     for k, v in batch.logging_info.stage_times.items()})
        if param.return_frames:
            return frames
        return result

    @staticmethod
    def _postprocess(output: np.ndarray) -> list[np.ndarray]:
        """[B, C, T, H, W] in [-1, 1] -> list of [T, H, W, C] uint8."""
        video = ((np.clip(output, -1, 1) + 1) / 2 * 255).round().astype(
            np.uint8)
        return [v.transpose(1, 2, 3, 0) for v in video]

    @staticmethod
    def _write_mp4(path: str, frames: np.ndarray, fps: int) -> bool:
        try:
            import imageio.v2 as imageio

            with imageio.get_writer(path, fps=fps,
                                    macro_block_size=None) as writer:
                for frame in frames:
                    writer.append_data(frame)
            return True
        except Exception as e:
            logger.warning("mp4 write failed (%s); writing .npy instead", e)
            np.save(path + ".npy", frames)
            return False

    def _save_wav(self, audio: np.ndarray, sample_rate: int,
                  param: SamplingParam) -> str:
        """Write [samples, channels] float waveform as 16-bit PCM wav."""
        import wave

        os.makedirs(param.output_path, exist_ok=True)
        name = param.output_video_name or "audio"
        if name.endswith(".mp4"):
            name = name[:-4]
        if not name.endswith(".wav"):
            name += ".wav"
        path = os.path.join(param.output_path, name)
        pcm = (np.clip(audio, -1.0, 1.0) * 32767.0).astype("<i2")
        with wave.open(path, "wb") as fh:
            fh.setnchannels(pcm.shape[1] if pcm.ndim == 2 else 1)
            fh.setsampwidth(2)
            fh.setframerate(int(sample_rate))
            fh.writeframes(pcm.tobytes())
        logger.info("Saved audio to %s", path)
        return path

    def _save_video(self, frames: np.ndarray, param: SamplingParam) -> str:
        os.makedirs(param.output_path, exist_ok=True)
        name = param.output_video_name
        if not name:
            prompt_str = (param.prompt if isinstance(param.prompt, str) else
                          (param.prompt or ["video"])[0])
            name = "".join(c if c.isalnum() or c in " _-" else ""
                           for c in prompt_str)[:100].strip() or "video"
        if not name.endswith(".mp4"):
            name += ".mp4"
        path = os.path.join(param.output_path, name)
        self._write_mp4(path, frames, param.fps or 16)
        logger.info("Saved video to %s", path)
        return path

    def set_lora_adapter(self, lora_nickname: str,
                         lora_path: str | None = None) -> None:
        self.executor.set_lora_adapter(lora_nickname, lora_path)

    def shutdown(self) -> None:
        self.executor.shutdown()
