"""Misc utilities (analog of /root/reference/fastvideo/utils.py).

Includes: persistent-compile-cache setup, dtype resolution, seeding, model
path resolution (local-only in the zero-egress environment), alignment
helpers.
"""

from __future__ import annotations

import os
import random

import numpy as np

from fastvideo_tpu import envs
from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)

_cache_enabled = False

STR_DTYPE_TO_JAX = {}


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (amortizes the 20-40s TPU compiles)."""
    global _cache_enabled
    if _cache_enabled:
        return
    cache_dir = envs.FASTVIDEO_COMPILE_CACHE
    if not cache_dir:
        return
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _cache_enabled = True
    except Exception as e:  # pragma: no cover
        logger.warning("compilation cache unavailable: %s", e)


def get_compute_dtype(precision: str):
    import jax.numpy as jnp

    return {
        "fp32": jnp.float32,
        "float32": jnp.float32,
        "bf16": jnp.bfloat16,
        "bfloat16": jnp.bfloat16,
        "fp16": jnp.float16,
    }[precision]


def set_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def align_to(value: int, alignment: int) -> int:
    return ((value + alignment - 1) // alignment) * alignment


def maybe_download_model(model_path: str) -> str:
    """Resolve a model path. Zero-egress: only local paths are valid."""
    if os.path.isdir(model_path):
        return model_path
    cache_root = envs.FASTVIDEO_CACHE_ROOT
    candidate = os.path.join(cache_root, "models",
                             model_path.replace("/", "--"))
    if os.path.isdir(candidate):
        return candidate
    raise FileNotFoundError(
        f"Model {model_path!r} is not a local directory. This environment "
        "has no network egress; pre-download the diffusers checkpoint and "
        f"pass its path (searched: {candidate}).")


def verify_model_config_and_directory(model_path: str) -> dict:
    import json

    index = os.path.join(model_path, "model_index.json")
    if not os.path.exists(index):
        raise FileNotFoundError(f"{index} missing")
    with open(index) as fh:
        return json.load(fh)
