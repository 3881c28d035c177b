"""Safetensors shard iteration (diffusers/HF layout).

Analog of the reference's safetensors weight iterators
(/root/reference/fastvideo/models/loader/component_loader.py). Streams one
tensor at a time via ``safe_open`` so multi-GB checkpoints never double in
host RAM.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Iterator

import numpy as np
from safetensors import safe_open

from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)


def find_safetensors_files(directory: str) -> list[str]:
    index_files = glob.glob(os.path.join(directory,
                                         "*.safetensors.index.json"))
    if index_files:
        with open(index_files[0]) as fh:
            index = json.load(fh)
        shards = sorted(set(index["weight_map"].values()))
        return [os.path.join(directory, s) for s in shards]
    files = sorted(glob.glob(os.path.join(directory, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"No safetensors files under {directory}")
    return files


def iterate_safetensors(directory: str) -> Iterator[tuple[str, np.ndarray]]:
    for path in find_safetensors_files(directory):
        with safe_open(path, framework="numpy") as f:
            for name in f.keys():  # noqa: SIM118
                yield name, f.get_tensor(name)


def load_json_config(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)
