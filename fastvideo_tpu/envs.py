"""Lazily-evaluated environment flag system.

TPU-native analog of the reference env-flag module
(/root/reference/fastvideo/envs.py:82-273): ~flags are resolved on attribute
access via module ``__getattr__`` so that ``os.environ`` changes made before
first use are honored, and each flag documents itself in ``environment_flags``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

# Flag name -> thunk producing the current value.
environment_flags: dict[str, Callable[[], Any]] = {
    # Attention backend selection (reference: FASTVIDEO_ATTENTION_BACKEND).
    "FASTVIDEO_ATTENTION_BACKEND":
    lambda: os.getenv("FASTVIDEO_ATTENTION_BACKEND", None),
    # Comma-separated per-component backend override, e.g. "dit:FLASH_ATTN".
    "FASTVIDEO_ATTENTION_CONFIG":
    lambda: os.getenv("FASTVIDEO_ATTENTION_CONFIG", None),
    # Logging level for the framework logger.
    "FASTVIDEO_LOGGING_LEVEL":
    lambda: os.getenv("FASTVIDEO_LOGGING_LEVEL", "INFO"),
    # Root dir for cached artifacts (downloaded models, goldens).
    "FASTVIDEO_CACHE_ROOT":
    lambda: os.path.expanduser(
        os.getenv("FASTVIDEO_CACHE_ROOT", "~/.cache/fastvideo_tpu")),
    # jax.profiler trace output dir; empty disables profiling.
    "FASTVIDEO_TRACE_DIR":
    lambda: os.getenv("FASTVIDEO_TRACE_DIR", ""),
    # Profiler step window: start step and number of steps to trace.
    "FASTVIDEO_PROFILE_START_STEP":
    lambda: int(os.getenv("FASTVIDEO_PROFILE_START_STEP", "3")),
    "FASTVIDEO_PROFILE_NUM_STEPS":
    lambda: int(os.getenv("FASTVIDEO_PROFILE_NUM_STEPS", "2")),
    # Per-stage wall-time logging (reference: FASTVIDEO_STAGE_LOGGING).
    "FASTVIDEO_STAGE_LOGGING":
    lambda: os.getenv("FASTVIDEO_STAGE_LOGGING", "0") in ("1", "true", "True"),
    # Force a device settle (1-element host fetch) at every stage boundary
    # so stage wall times attribute async-dispatched device work to the
    # stage that issued it (JAX dispatch is async; on some transports
    # block_until_ready is a no-op). Costs ~1 RTT per stage.
    "FASTVIDEO_STAGE_SYNC":
    lambda: os.getenv("FASTVIDEO_STAGE_SYNC", "0") in ("1", "true", "True"),
    # Activation-trace JSONL dump (reference: FASTVIDEO_TRACE_ACTIVATIONS).
    "FASTVIDEO_TRACE_ACTIVATIONS":
    lambda: os.getenv("FASTVIDEO_TRACE_ACTIVATIONS", "0") in
    ("1", "true", "True"),
    "FASTVIDEO_TRACE_ACTIVATIONS_DIR":
    lambda: os.getenv("FASTVIDEO_TRACE_ACTIVATIONS_DIR", "activation_traces"),
    # Force the device platform ("cpu" useful for tests).
    "FASTVIDEO_DEVICE":
    lambda: os.getenv("FASTVIDEO_DEVICE", None),
    # Number of virtual host devices for CPU-mesh testing.
    "FASTVIDEO_HOST_DEVICE_COUNT":
    lambda: int(os.getenv("FASTVIDEO_HOST_DEVICE_COUNT", "0")),
    # Transformer quantization override; "" disables. Accepted values are
    # the aliases in layers/quantization/int8.py (W8A8_ALIASES +
    # WEIGHT_ONLY_ALIASES: "int8"/"w8a8"/... and "int8-weight-only"/"w8").
    # Same effect as FastVideoArgs.transformer_quant /
    # api EngineConfig.quantization.transformer_quant.
    "FASTVIDEO_TRANSFORMER_QUANT":
    lambda: os.getenv("FASTVIDEO_TRANSFORMER_QUANT", "") or None,
    # Text-encoder quantization override; "" disables. int8 weight-only is
    # the intended setting (analog of the reference's
    # --text-encoder-precision fp8): UMT5-XXL is 9+ GB bf16 and load-time
    # host quantization halves both the upload and resident HBM. Same
    # effect as FastVideoArgs.text_encoder_quant.
    "FASTVIDEO_TEXT_ENCODER_QUANT":
    lambda: os.getenv("FASTVIDEO_TEXT_ENCODER_QUANT", "") or None,
    # Watchdog timeout (seconds) for one engine iteration.
    "FASTVIDEO_ENGINE_ITERATION_TIMEOUT_S":
    lambda: int(os.getenv("FASTVIDEO_ENGINE_ITERATION_TIMEOUT_S", "600")),
    # Snap request shapes to canonical buckets (bounds XLA compiles in
    # serving; consumed by pipelines/stages/input_validation.py).
    "FASTVIDEO_SHAPE_BUCKETS":
    lambda: os.getenv("FASTVIDEO_SHAPE_BUCKETS", "0") in
    ("1", "true", "True"),
    # Disable donation of latent buffers (debugging aid).
    "FASTVIDEO_DISABLE_DONATION":
    lambda: os.getenv("FASTVIDEO_DISABLE_DONATION", "0") == "1",
    # Persistent compilation cache directory ("" disables).
    "FASTVIDEO_COMPILE_CACHE":
    lambda: os.getenv("FASTVIDEO_COMPILE_CACHE",
                      os.path.expanduser("~/.cache/fastvideo_tpu/jax_cache")),
    # Draw initial latents with on-device jax.random (threefry) instead of
    # the host torch CPU generator. Faster (no host->device transfer of the
    # noise tensor) but NOT bitwise-equal to diffusers randn_tensor — leave
    # off when torch-seed parity matters (PSNR gates).
    "FASTVIDEO_DEVICE_RNG":
    lambda: os.getenv("FASTVIDEO_DEVICE_RNG", "0") in ("1", "true", "True"),
}


def __getattr__(name: str) -> Any:
    if name in environment_flags:
        return environment_flags[name]()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__() -> list[str]:
    return list(environment_flags.keys())
