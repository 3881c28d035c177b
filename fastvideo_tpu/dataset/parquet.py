"""Parquet map-style dataset for precomputed latents + text embeddings.

Analog of /root/reference/fastvideo/dataset/parquet_dataset_map_style.py:
rows hold VAE latents and text embeddings; ``DPSPBatchSampler`` (:26)
assigns the SAME batch to every rank of an SP group and DIFFERENT batches
across DP groups, seeded and resumable. On TPU the "ranks" are mesh
positions; since one controller feeds the whole mesh, the sampler yields
per-dp-group batches that the trainer shards over the dp axis.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import numpy as np

from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)


def pyarrow_schema_t2v():
    import pyarrow as pa

    return pa.schema([
        ("id", pa.string()),
        ("latents", pa.binary()),
        ("latents_shape", pa.list_(pa.int32())),
        ("latents_dtype", pa.string()),
        ("text_embedding", pa.binary()),
        ("text_embedding_shape", pa.list_(pa.int32())),
        ("text_embedding_dtype", pa.string()),
        ("caption", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("num_frames", pa.int32()),
        ("fps", pa.float32()),
        ("duration", pa.float32()),
    ])


def pyarrow_schema_i2v():
    """T2V columns + first-frame conditioning (reference
    dataset/dataloader/schema.py pyarrow_schema_i2v: CLIP image feature +
    first-frame VAE latent per record)."""
    import pyarrow as pa

    return pa.schema([
        *pyarrow_schema_t2v(),
        ("clip_feature", pa.binary()),
        ("clip_feature_shape", pa.list_(pa.int32())),
        ("clip_feature_dtype", pa.string()),
        ("first_frame_latent", pa.binary()),
        ("first_frame_latent_shape", pa.list_(pa.int32())),
        ("first_frame_latent_dtype", pa.string()),
    ])


def pyarrow_schema_ode():
    """Teacher ODE-trajectory records for sparse distillation (reference
    schema.py pyarrow_schema_ode_trajectory_text_only): text embedding plus
    the full denoising trajectory (latents at every solver step and the
    matching timesteps) — what DMD2/self-forcing students regress onto."""
    import pyarrow as pa

    return pa.schema([
        ("id", pa.string()),
        ("text_embedding", pa.binary()),
        ("text_embedding_shape", pa.list_(pa.int32())),
        ("text_embedding_dtype", pa.string()),
        ("trajectory_latents", pa.binary()),
        ("trajectory_latents_shape", pa.list_(pa.int32())),
        ("trajectory_latents_dtype", pa.string()),
        ("trajectory_timesteps", pa.binary()),
        ("trajectory_timesteps_shape", pa.list_(pa.int32())),
        ("trajectory_timesteps_dtype", pa.string()),
        ("caption", pa.string()),
    ])


def _tensor_fields(name: str, arr: np.ndarray) -> dict:
    return {
        name: arr.tobytes(),
        f"{name}_shape": list(arr.shape),
        f"{name}_dtype": str(arr.dtype),
    }


def record_from_i2v_sample(sample_id: str, latents: np.ndarray,
                           text_embedding: np.ndarray,
                           clip_feature: np.ndarray,
                           first_frame_latent: np.ndarray,
                           caption: str = "", width: int = 0, height: int = 0,
                           num_frames: int = 0, fps: float = 0.0,
                           duration: float = 0.0) -> dict:
    rec = record_from_sample(sample_id, latents, text_embedding,
                             caption=caption, width=width, height=height,
                             num_frames=num_frames, fps=fps,
                             duration=duration)
    rec.update(_tensor_fields("clip_feature", clip_feature))
    rec.update(_tensor_fields("first_frame_latent", first_frame_latent))
    return rec


def record_from_ode_sample(sample_id: str, text_embedding: np.ndarray,
                           trajectory_latents: np.ndarray,
                           trajectory_timesteps: np.ndarray,
                           caption: str = "") -> dict:
    return {
        "id": sample_id,
        **_tensor_fields("text_embedding", text_embedding),
        **_tensor_fields("trajectory_latents", trajectory_latents),
        **_tensor_fields("trajectory_timesteps", trajectory_timesteps),
        "caption": caption,
    }


def record_from_sample(sample_id: str, latents: np.ndarray,
                       text_embedding: np.ndarray, caption: str = "",
                       width: int = 0, height: int = 0, num_frames: int = 0,
                       fps: float = 0.0, duration: float = 0.0) -> dict:
    return {
        "id": sample_id,
        "latents": latents.tobytes(),
        "latents_shape": list(latents.shape),
        "latents_dtype": str(latents.dtype),
        "text_embedding": text_embedding.tobytes(),
        "text_embedding_shape": list(text_embedding.shape),
        "text_embedding_dtype": str(text_embedding.dtype),
        "caption": caption,
        "width": width,
        "height": height,
        "num_frames": num_frames,
        "fps": fps,
        "duration": duration,
    }


def write_parquet_dataset(records: list[dict], out_dir: str,
                          rows_per_file: int = 256, schema=None) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    schema = schema if schema is not None else pyarrow_schema_t2v()
    # continue numbering after existing shards so successive flushes
    # (PreprocessPipeline streams every samples_per_file) never overwrite
    start = len([f for f in os.listdir(out_dir) if f.endswith(".parquet")])
    for i in range(0, len(records), rows_per_file):
        chunk = records[i:i + rows_per_file]
        table = pa.Table.from_pylist(chunk, schema=schema)
        idx = start + i // rows_per_file
        pq.write_table(table,
                       os.path.join(out_dir, f"data_{idx:05d}.parquet"))
    logger.info("Wrote %d records to %s", len(records), out_dir)


def _decode_field(row: dict, name: str) -> np.ndarray:
    arr = np.frombuffer(row[name], dtype=np.dtype(row[f"{name}_dtype"]))
    return arr.reshape(row[f"{name}_shape"]).copy()


class LatentsParquetMapStyleDataset:
    """Random-access dataset over parquet shards (reference :311)."""

    def __init__(self, path: str, text_drop_rate: float = 0.0,
                 seed: int = 42,
                 extra_columns: tuple[str, ...] = ()):
        """``extra_columns`` names additional tensor columns (e.g. the i2v
        schema's ``clip_feature`` / ``first_frame_latent``); when set,
        ``__getitem__`` returns (latents, text, {col: array})."""
        import pyarrow.parquet as pq

        self.extra_columns = tuple(extra_columns)

        self.files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".parquet"))
        if not self.files:
            raise FileNotFoundError(f"no parquet files under {path}")
        self._lens = [pq.ParquetFile(f).metadata.num_rows
                      for f in self.files]
        self._offsets = np.cumsum([0, *self._lens])
        self.text_drop_rate = text_drop_rate
        self._rng = np.random.default_rng(seed)
        self._tables: dict[int, object] = {}

    def __len__(self) -> int:
        return int(self._offsets[-1])

    # keep only the most recent shards resident — samplers read
    # near-sequentially within a shard, but an epoch touches every shard
    # and an unbounded cache would pin the whole dataset in host RAM
    _TABLE_CACHE_MAX = 4

    def _table(self, file_idx: int):
        import pyarrow.parquet as pq

        if file_idx not in self._tables:
            while len(self._tables) >= self._TABLE_CACHE_MAX:
                self._tables.pop(next(iter(self._tables)))
            self._tables[file_idx] = pq.read_table(self.files[file_idx])
        else:
            # refresh LRU position
            self._tables[file_idx] = self._tables.pop(file_idx)
        return self._tables[file_idx]

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        file_idx = int(np.searchsorted(self._offsets, idx, "right") - 1)
        row_idx = idx - int(self._offsets[file_idx])
        row = {
            k: v[0]
            for k, v in self._table(file_idx).slice(
                row_idx, 1).to_pydict().items()
        }
        latents = _decode_field(row, "latents")
        text = _decode_field(row, "text_embedding")
        if self.text_drop_rate and self._rng.random() < self.text_drop_rate:
            text = np.zeros_like(text)  # CFG dropout (reference :380)
        if self.extra_columns:
            return latents, text, {c: _decode_field(row, c)
                                   for c in self.extra_columns}
        return latents, text


class ODETrajectoryParquetDataset:
    """Random-access reader over ``pyarrow_schema_ode`` shards: each item is
    (trajectory_latents [S, C, T, H, W], trajectory_timesteps [S],
    text_embedding [L, D]). Distillation methods regress students onto
    these teacher solver states."""

    def __init__(self, path: str):
        import pyarrow.parquet as pq

        self.files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".parquet"))
        if not self.files:
            raise FileNotFoundError(f"no parquet files under {path}")
        self._lens = [pq.ParquetFile(f).metadata.num_rows
                      for f in self.files]
        self._offsets = np.cumsum([0, *self._lens])
        self._tables: dict[int, object] = {}

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def _table(self, file_idx: int):
        import pyarrow.parquet as pq

        if file_idx not in self._tables:
            if len(self._tables) >= 4:
                self._tables.pop(next(iter(self._tables)))
            self._tables[file_idx] = pq.read_table(self.files[file_idx])
        return self._tables[file_idx]

    def __getitem__(self, idx: int):
        file_idx = int(np.searchsorted(self._offsets, idx, "right") - 1)
        row_idx = idx - int(self._offsets[file_idx])
        row = {k: v[0] for k, v in
               self._table(file_idx).slice(row_idx, 1).to_pydict().items()}
        return (_decode_field(row, "trajectory_latents"),
                _decode_field(row, "trajectory_timesteps"),
                _decode_field(row, "text_embedding"))


def build_ode_dataloader(path: str, batch_size: int, seed: int = 42):
    """Yields (traj_latents [B, S, ...], traj_timesteps [B, S],
    embeds [B, L, D]) numpy triples, shuffled per epoch."""
    dataset = ODETrajectoryParquetDataset(path)
    sampler = DPSPBatchSampler(len(dataset), batch_size, 1, 0, seed)

    def iterate():
        while True:
            for batch_indices in sampler:
                items = [dataset[i] for i in batch_indices]
                yield (np.stack([it[0] for it in items]),
                       np.stack([it[1] for it in items]),
                       np.stack([it[2] for it in items]))

    return iterate()


class DPSPBatchSampler:
    """Seeded, resumable batch sampler; one batch per dp group per step
    (reference parquet_dataset_map_style.py:26)."""

    def __init__(self, dataset_len: int, batch_size: int, num_dp_groups: int,
                 dp_group_rank: int = 0, seed: int = 42, drop_last: bool = True):
        self.dataset_len = dataset_len
        self.batch_size = batch_size
        self.num_dp_groups = num_dp_groups
        self.dp_group_rank = dp_group_rank
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0

    def __iter__(self) -> Iterator[list[int]]:
        rng = np.random.default_rng(self.seed + self.epoch)
        perm = rng.permutation(self.dataset_len)
        global_bs = self.batch_size * self.num_dp_groups
        n_batches = (self.dataset_len // global_bs if self.drop_last else
                     -(-self.dataset_len // global_bs))
        for b in range(n_batches):
            start = b * global_bs + self.dp_group_rank * self.batch_size
            yield [int(i) for i in perm[start:start + self.batch_size]]
        self.epoch += 1

    def state_dict(self) -> dict:
        return {"epoch": self.epoch, "seed": self.seed}

    def load_state_dict(self, state: dict) -> None:
        self.epoch = state["epoch"]
        self.seed = state["seed"]


class _AccumSampler:
    """Groups ``accum`` micro-batch index lists into one train-step item,
    delegating epoch/state to the underlying DPSPBatchSampler."""

    def __init__(self, base: DPSPBatchSampler, accum: int):
        self.base = base
        self.accum = max(1, int(accum))

    def __iter__(self):
        group: list[list[int]] = []
        for indices in self.base:
            group.append(indices)
            if len(group) == self.accum:
                yield group
                group = []

    @property
    def epoch(self) -> int:
        return self.base.epoch

    @epoch.setter
    def epoch(self, value: int) -> None:
        self.base.epoch = int(value)

    def state_dict(self) -> dict:
        return self.base.state_dict()

    def load_state_dict(self, state: dict) -> None:
        self.base.load_state_dict(state)


def build_parquet_dataloader(path: str, batch_size: int,
                             num_dp_groups: int = 1,
                             accum: int = 1, text_drop_rate: float = 0.0,
                             seed: int = 42, prefetch: int = 2):
    """Yields ([accum, B, ...] latents, [accum, B, L, D] embeds) numpy pairs.

    Batches are decoded by a background prefetch thread (``prefetch`` deep)
    so host parquet IO overlaps the device step — the reference gets this
    from torchdata's StatefulDataLoader (parquet_dataset_map_style.py:417);
    here :class:`fastvideo_tpu.dataset.loader.PrefetchingLoader` carries the
    same resume semantics (state_dict/load_state_dict)."""
    from fastvideo_tpu.dataset.loader import PrefetchingLoader

    dataset = LatentsParquetMapStyleDataset(path, text_drop_rate, seed)
    sampler = _AccumSampler(
        DPSPBatchSampler(len(dataset), batch_size * num_dp_groups, 1, 0,
                         seed), accum)

    def make_batch(groups: list[list[int]]):
        micros = []
        for batch_indices in groups:
            lat = np.stack([dataset[i][0] for i in batch_indices])
            txt = np.stack([dataset[i][1] for i in batch_indices])
            micros.append((lat, txt))
        return (np.stack([m[0] for m in micros]),
                np.stack([m[1] for m in micros]))

    return PrefetchingLoader(sampler, make_batch, prefetch=prefetch)
