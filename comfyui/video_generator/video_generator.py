"""VideoGenerator ComfyUI node over fastvideo_tpu.

Behavior analog of /root/reference/comfyui/video_generator/
video_generator.py (:49-293): builds a cached
``fastvideo_tpu.VideoGenerator`` from the node inputs, merges the
config-node dicts, runs generation on a worker thread with an
interruption monitor (ComfyUI's ``processing_interrupted``), and
returns the output video path. TPU deviation: interruption cannot
SIGINT per-GPU worker processes (single-controller JAX) — the monitor
marks the run cancelled and the result is discarded when the step
completes.
"""

from __future__ import annotations

import glob
import os
import threading
import time
from typing import Any


def _processing_interrupted() -> bool:
    try:
        from comfy.model_management import processing_interrupted

        return bool(processing_interrupted())
    except ImportError:
        return False


class GenerationCancelledException(Exception):
    def __init__(self, message: str = "Generation was cancelled by user"):
        self.message = message
        super().__init__(message)


def update_config_from_args(config: Any, args: dict[str, Any]) -> None:
    """Apply overrides onto a config object (reference :32-45)."""
    for key, value in args.items():
        if hasattr(config, key) and value is not None:
            if key == "text_encoder_precisions" and isinstance(value, list):
                setattr(config, key, tuple(value))
            else:
                setattr(config, key, value)


class VideoGenerator:
    _generator = None
    _generator_key: tuple | None = None

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "prompt": ("STRING", {"multiline": True, "default":
                           "A cinematic shot of ocean waves at sunset."}),
                "output_path": ("STRING", {"default": "outputs/comfyui"}),
                "model_path": ("STRING", {"default": ""}),
                "num_gpus": ("INT", {"default": 1}),
            },
            "optional": {
                "sp_size": ("INT", {"default": -99999}),
                "tp_size": ("INT", {"default": -99999}),
                "precision": ("STRING", {"default": ""}),
                "vae_precision": ("STRING", {"default": ""}),
                "text_encoder_precision": ("STRING", {"default": ""}),
                "embedded_cfg_scale": ("FLOAT", {"default": 6.0}),
                "vae_tiling": ([True, False], {"default": True}),
                "vae_sp": ([True, False], {"default": False}),
                "dit_cpu_offload": ([True, False], {"default": False}),
                "inference_args": ("INFERENCE_ARGS",),
                "vae_config": ("VAE_CONFIG",),
                "text_encoder_config": ("TEXT_ENCODER_CONFIG",),
                "dit_config": ("DIT_CONFIG",),
            },
        }

    @classmethod
    def VALIDATE_INPUTS(cls, **kwargs):
        return True

    RETURN_TYPES = ("STRING",)
    RETURN_NAMES = ("video_path",)
    FUNCTION = "launch_inference"
    CATEGORY = "fastvideo"

    # -- generator cache -----------------------------------------------------

    def _get_generator(self, model_path: str, num_gpus: int,
                       overrides: dict[str, Any]):
        from fastvideo_tpu.entrypoints.video_generator import (
            VideoGenerator as TPUVideoGenerator)

        key = (model_path, num_gpus,
               tuple(sorted(overrides.items(), key=lambda kv: kv[0])))
        cls = type(self)
        if cls._generator is None or cls._generator_key != key:
            cls._generator = TPUVideoGenerator.from_pretrained(
                model_path, num_gpus=num_gpus, **overrides)
            cls._generator_key = key
        return cls._generator

    def load_output_video(self, output_dir: str) -> str:
        """Newest video file under output_dir (reference :106-118)."""
        files: list[str] = []
        for ext in ("*.mp4", "*.avi", "*.mov", "*.mkv"):
            files.extend(glob.glob(os.path.join(output_dir, ext)))
        if not files:
            return ""
        return max(files, key=os.path.getmtime)

    # -- inference -----------------------------------------------------------

    def launch_inference(self, prompt, output_path, model_path, num_gpus=1,
                         sp_size=None, tp_size=None, precision="",
                         vae_precision="", text_encoder_precision="",
                         embedded_cfg_scale=6.0, vae_tiling=True,
                         vae_sp=False, dit_cpu_offload=False,
                         inference_args=None, vae_config=None,
                         text_encoder_config=None, dit_config=None):
        overrides: dict[str, Any] = {}
        for key, val in (("sp_size", sp_size), ("tp_size", tp_size),
                         ("precision", precision),
                         ("vae_precision", vae_precision),
                         ("text_encoder_precision",
                          text_encoder_precision),
                         ("vae_tiling", vae_tiling),
                         ("vae_sp", vae_sp),
                         ("dit_cpu_offload", dit_cpu_offload)):
            if val in (None, "", -99999):
                continue
            overrides[key] = val
        generator = self._get_generator(model_path, int(num_gpus),
                                        overrides)
        for cfg_dict in (vae_config, text_encoder_config, dit_config):
            if cfg_dict:
                update_config_from_args(
                    generator.fastvideo_args.pipeline_config, cfg_dict)

        os.makedirs(output_path, exist_ok=True)
        kwargs = dict(inference_args or {})
        kwargs.pop("fps", None)
        image_path = kwargs.pop("image_path", None)
        if image_path:
            kwargs["image_path"] = image_path

        state: dict[str, Any] = {"done": False, "error": None}
        cancel = threading.Event()

        def run():
            try:
                generator.generate_video(prompt=prompt,
                                         output_path=output_path,
                                         save_video=True, **kwargs)
            except Exception as exc:  # surfaced after join
                state["error"] = exc
            finally:
                state["done"] = True

        worker = threading.Thread(target=run, daemon=True)
        worker.start()
        while worker.is_alive():
            if _processing_interrupted():
                cancel.set()
            worker.join(timeout=0.5)
        if state["error"] is not None:
            raise state["error"]
        if cancel.is_set():
            raise GenerationCancelledException()
        return (self.load_output_video(output_path),)
