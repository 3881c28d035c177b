"""Validation dataset for training-time sample generation.

Analog of /root/reference/fastvideo/dataset/validation_dataset.py (:18-206):
a csv/json/parquet/arrow file of prompts (plus optional image/video paths)
that validation callbacks iterate during training. Samples are padded
cyclically to a multiple of the number of data-parallel groups and each
group reads only its own contiguous slice, so every dp group generates the
same number of validation clips per step (reference :60-105).

Differences by design: no HuggingFace ``datasets`` dependency (stdlib
csv/json + pyarrow, which the training data path already requires), and the
dp-group id comes from the live ``jax.sharding.Mesh`` (parallel/mesh.py)
instead of torch.distributed ranks — under single-controller SPMD every
process sees the whole mesh, so the shard index is an argument with a
mesh-derived default rather than a global.
"""

from __future__ import annotations

import csv
import json
import os
import pathlib
from collections.abc import Iterator
from typing import Any

from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)

_SUPPORTED = (".csv", ".json", ".jsonl", ".parquet", ".arrow")


def _load_rows(path: pathlib.Path) -> list[dict]:
    suffix = path.suffix.lower()
    if suffix == ".csv":
        with open(path, newline="") as fh:
            return [dict(r) for r in csv.DictReader(fh)]
    if suffix == ".json":
        with open(path) as fh:
            doc = json.load(fh)
        rows = doc.get("data") if isinstance(doc, dict) else doc
        if not isinstance(rows, list):
            raise ValueError(
                f"{path}: json validation data must be a list or have a "
                "top-level 'data' list (reference field='data', "
                "validation_dataset.py:37-41)")
        return [dict(r) for r in rows]
    if suffix == ".jsonl":
        with open(path) as fh:
            return [json.loads(ln) for ln in fh if ln.strip()]
    if suffix in (".parquet", ".arrow"):
        import pyarrow as pa
        import pyarrow.parquet as pq

        if suffix == ".parquet":
            table = pq.read_table(path)
        else:
            with pa.memory_map(str(path)) as src:
                table = pa.ipc.open_file(src).read_all()
        return table.to_pylist()
    raise ValueError(f"Unsupported validation dataset format {suffix}; "
                     f"supported: {_SUPPORTED}")


class ValidationDataset:
    def __init__(self, filename: str, num_dp_groups: int | None = None,
                 dp_group_id: int | None = None):
        self.filename = pathlib.Path(filename)
        self.dir = os.path.abspath(self.filename.parent)
        if not self.filename.exists():
            raise FileNotFoundError(f"File {self.filename} does not exist")

        all_samples = _load_rows(self.filename)
        self.original_total_samples = len(all_samples)

        if num_dp_groups is None or dp_group_id is None:
            num_dp_groups, dp_group_id = self._mesh_defaults()
        self.num_dp_groups = max(1, num_dp_groups)
        self.dp_group_id = dp_group_id

        # pad cyclically so every dp group gets an equal share
        rem = len(all_samples) % self.num_dp_groups
        if rem:
            all_samples = all_samples + [
                all_samples[i % len(all_samples)]
                for i in range(self.num_dp_groups - rem)
            ]
        self.total_samples = len(all_samples)
        per_group = self.total_samples // self.num_dp_groups
        self.start_idx = self.dp_group_id * per_group
        self.end_idx = self.start_idx + per_group
        self.samples = all_samples[self.start_idx:self.end_idx]
        logger.info(
            "validation dataset %s: %d samples (+%d pad) -> dp group %d/%d "
            "reads [%d:%d]", self.filename.name,
            self.original_total_samples,
            self.total_samples - self.original_total_samples,
            self.dp_group_id, self.num_dp_groups, self.start_idx,
            self.end_idx)

    @staticmethod
    def _mesh_defaults() -> tuple[int, int]:
        try:
            from fastvideo_tpu.parallel import get_dp_size

            return get_dp_size(), 0
        except Exception:
            return 1, 0

    def __len__(self) -> int:
        return len(self.samples)

    def __iter__(self) -> Iterator[dict[str, Any]]:
        for raw in self.samples:
            sample = dict(raw)
            if "caption" not in sample:
                raise ValueError(
                    "validation datasets must provide a 'caption' column "
                    "(reference validation_dataset.py:113)")
            sample["prompt"] = sample["caption"]
            sample.setdefault("image", None)
            sample.setdefault("video", None)
            for key, loader in (("image_path", "image"),
                                ("video_path", "video")):
                rel = sample.get(key)
                if not rel:
                    continue
                path = rel if os.path.isabs(rel) else os.path.join(
                    self.dir, rel)
                if loader == "image":
                    from PIL import Image
                    import numpy as np

                    sample["image"] = np.asarray(
                        Image.open(path).convert("RGB"))
                else:
                    from fastvideo_tpu.pipelines.preprocess import (
                        preprocess_pipeline as pp)

                    sample["video"] = pp.load_video_frames(path)
            yield sample
