"""Staged raw-video preprocessing datasets + validation dataset
(dataset/preprocessing.py, dataset/validation.py — reference
preprocessing_datasets.py / validation_dataset.py)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import TINY_T5, _make_tokenizer  # noqa: E402


def _write_video(path, t=12, h=24, w=40, seed=0):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 255, size=(t, h, w, 3), dtype=np.uint8)
    np.save(path, frames)
    return frames


def _make_merge_file(tmp_path, rows):
    folder = tmp_path / "videos"
    folder.mkdir(exist_ok=True)
    anno = tmp_path / "anno.json"
    with open(anno, "w") as fh:
        json.dump(rows, fh)
    merge = tmp_path / "merge.txt"
    merge.write_text(f"{folder},{anno}\n")
    return folder, merge


@pytest.fixture()
def tokenizer(tmp_path):
    tok_dir = str(tmp_path / "tok")
    _make_tokenizer(tok_dir, TINY_T5["vocab_size"])
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(tok_dir)


def test_merged_dataset_filters_and_transforms(tmp_path, tokenizer):
    from fastvideo_tpu.dataset.preprocessing import (PreprocessDatasetArgs,
                                                     VideoCaptionMergedDataset)

    folder, merge = _make_merge_file(tmp_path, [
        # valid: 12 frames @ 4 fps = 3 s
        {"path": "a.npy", "cap": ["w1 w2"], "fps": 4.0, "duration": 3.0,
         "resolution": {"height": 24, "width": 40}},
        # no caption -> validation filter
        {"path": "b.npy", "fps": 4.0, "duration": 3.0},
        # video too long: 50 s > tolerance 5.0 x (4 frames / 4 fps) = 5 s
        {"path": "c.npy", "cap": "w3", "fps": 4.0, "duration": 50.0},
        # resolution below min -> resolution filter
        {"path": "d.npy", "cap": "w4", "fps": 4.0, "duration": 3.0,
         "resolution": {"height": 4, "width": 4}},
    ])
    for name in ("a", "b", "c", "d"):
        _write_video(folder / f"{name}.npy")

    args = PreprocessDatasetArgs(num_frames=4, train_fps=4.0,
                                 video_length_tolerance_range=5.0,
                                 max_height=16, max_width=32, min_height=8,
                                 min_width=8, text_max_length=8)
    ds = VideoCaptionMergedDataset(str(merge), args, tokenizer=tokenizer)
    assert len(ds) == 1  # b, c, d all filtered

    items = list(ds)
    assert len(items) == 1
    s = items[0]
    # fps resample 4->4 keeps indices, temporal crop to num_frames=4
    assert s["frames"].shape == (4, 16, 32, 3)
    assert s["frames"].dtype == np.uint8
    assert s["pixel_values"].shape == (3, 4, 16, 32)
    assert -1.0 <= s["pixel_values"].min() and s["pixel_values"].max() <= 1.0
    assert s["input_ids"].shape == (8,)
    assert s["caption"] == "w1 w2"
    assert s["fps"] == 4.0


def test_merged_dataset_fps_resample_and_resume(tmp_path, tokenizer):
    from fastvideo_tpu.dataset.preprocessing import (PreprocessDatasetArgs,
                                                     VideoCaptionMergedDataset)

    rows = [{"path": f"v{i}.npy", "cap": f"w{i}", "fps": 8.0,
             "duration": 1.5} for i in range(3)]
    folder, merge = _make_merge_file(tmp_path, rows)
    for i in range(3):
        _write_video(folder / f"v{i}.npy", seed=i)

    args = PreprocessDatasetArgs(num_frames=4, train_fps=4.0,
                                 max_height=16, max_width=16,
                                 text_max_length=8)
    ds = VideoCaptionMergedDataset(str(merge), args, tokenizer=tokenizer)
    assert len(ds) == 3
    # 8 fps source at train_fps 4 -> every 2nd frame, 12 frames -> 6 -> crop 4
    first = ds.samples[0]
    assert first.sample_num_frames == 4
    assert all(b - a == 2 for a, b in zip(first.sample_frame_index,
                                          first.sample_frame_index[1:]))

    # exact mid-iteration resume via the cursor
    it = iter(ds)
    got_first = next(it)
    state = ds.state_dict()
    assert state == {"cursor": 1}

    ds2 = VideoCaptionMergedDataset(str(merge), args, tokenizer=tokenizer)
    ds2.load_state_dict(state)
    rest = [s["id"] for s in ds2]
    assert rest == ["v1", "v2"]
    assert got_first["id"] == "v0"


def test_cfg_caption_dropout(tmp_path, tokenizer):
    from fastvideo_tpu.dataset.preprocessing import (PreprocessSample,
                                                     TextTokenizeStage)

    stage = TextTokenizeStage(tokenizer, text_max_length=8, cfg_rate=1.0,
                              seed=0)
    s = stage.process(PreprocessSample(path="x.mp4", cap="w1 w2"))
    assert s.text == ""
    stage = TextTokenizeStage(tokenizer, text_max_length=8, cfg_rate=0.0)
    s = stage.process(PreprocessSample(path="x.mp4", cap="w1 w2"))
    assert s.text == "w1 w2"
    assert int(s.cond_mask.sum()) >= 2


def test_text_dataset(tmp_path, tokenizer):
    from fastvideo_tpu.dataset.preprocessing import TextDataset

    (tmp_path / "prompts.txt").write_text("w1 w2\n\nw3\n")
    ds = TextDataset(str(tmp_path), tokenizer=tokenizer, text_max_length=8)
    items = list(ds)
    assert [s["caption"] for s in items] == ["w1 w2", "w3"]
    assert items[0]["input_ids"].shape == (8,)
    # cursor resume
    it = iter(ds)
    next(it)
    ds2 = TextDataset(str(tmp_path), tokenizer=tokenizer, text_max_length=8)
    ds2.load_state_dict(ds.state_dict())
    assert [s["caption"] for s in ds2] == ["w3"]


def test_merged_dataset_feeds_preprocess_pipeline(tmp_path, tokenizer):
    """End-to-end: merge file -> staged dataset -> PreprocessPipeline ->
    parquet records a training loader can read."""
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.encoders.t5 import T5ArchConfig
    from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig
    from fastvideo_tpu.dataset.parquet import build_parquet_dataloader
    from fastvideo_tpu.dataset.preprocessing import (PreprocessDatasetArgs,
                                                     VideoCaptionMergedDataset)
    from fastvideo_tpu.models.encoders.t5 import T5EncoderModel
    from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan
    from fastvideo_tpu.pipelines.preprocess.preprocess_pipeline import (
        PreprocessPipeline)
    from utils import TINY_VAE

    rows = [{"path": f"v{i}.npy", "cap": f"w{i}", "fps": 4.0,
             "duration": 1.5} for i in range(2)]
    folder, merge = _make_merge_file(tmp_path, rows)
    for i in range(2):
        _write_video(folder / f"v{i}.npy", t=6, seed=i)

    args = PreprocessDatasetArgs(num_frames=5, train_fps=4.0,
                                 max_height=16, max_width=16,
                                 text_max_length=16)
    ds = VideoCaptionMergedDataset(str(merge), args, tokenizer=tokenizer)

    vae = AutoencoderKLWan(
        WanVAEArchConfig(**{k: tuple(v) if isinstance(v, list) else v
                            for k, v in TINY_VAE.items()}),
        param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    enc = T5EncoderModel(
        T5ArchConfig(**{k: v for k, v in TINY_T5.items()
                        if k != "model_type"}, is_umt5=True),
        param_dtype=jnp.float32, rngs=nnx.Rngs(1))
    pipe = PreprocessPipeline(vae, enc, tokenizer, text_len=16)
    out_dir = str(tmp_path / "data")
    assert pipe.run(ds, out_dir) == 2
    loader = build_parquet_dataloader(out_dir, batch_size=2, accum=1)
    lat, txt = next(loader)
    assert lat.shape[0:2] == (1, 2)


def test_validation_dataset_formats_and_sharding(tmp_path):
    from fastvideo_tpu.dataset.validation import ValidationDataset

    rows = [{"caption": f"cap {i}"} for i in range(5)]

    jpath = tmp_path / "val.json"
    jpath.write_text(json.dumps({"data": rows}))
    ds = ValidationDataset(str(jpath))
    items = list(ds)
    assert len(items) == 5
    assert items[0]["prompt"] == "cap 0"
    assert items[0]["image"] is None and items[0]["video"] is None

    cpath = tmp_path / "val.csv"
    cpath.write_text("caption\n" + "\n".join(r["caption"] for r in rows))
    assert [s["prompt"] for s in ValidationDataset(str(cpath))] == [
        r["caption"] for r in rows]

    import pyarrow as pa
    import pyarrow.parquet as pq

    ppath = tmp_path / "val.parquet"
    pq.write_table(pa.table({"caption": [r["caption"] for r in rows]}),
                   ppath)
    # 5 samples over 2 dp groups -> padded to 6, 3 each, cyclic pad
    g0 = ValidationDataset(str(ppath), num_dp_groups=2, dp_group_id=0)
    g1 = ValidationDataset(str(ppath), num_dp_groups=2, dp_group_id=1)
    assert len(g0) == len(g1) == 3
    assert [s["prompt"] for s in g0] == ["cap 0", "cap 1", "cap 2"]
    assert [s["prompt"] for s in g1] == ["cap 3", "cap 4", "cap 0"]

    with pytest.raises(FileNotFoundError):
        ValidationDataset(str(tmp_path / "val.txt"))
    (tmp_path / "val.txt").write_text("x")
    with pytest.raises(ValueError):
        ValidationDataset(str(tmp_path / "val.txt"))


def test_validation_dataset_loads_media(tmp_path):
    from fastvideo_tpu.dataset.validation import ValidationDataset

    _write_video(tmp_path / "clip.npy", t=3, h=8, w=8)
    from PIL import Image

    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(tmp_path / "im.png")
    rows = [{"caption": "a", "video_path": "clip.npy"},
            {"caption": "b", "image_path": "im.png"}]
    jpath = tmp_path / "val.json"
    jpath.write_text(json.dumps({"data": rows}))
    items = list(ValidationDataset(str(jpath)))
    assert items[0]["video"].shape == (3, 8, 8, 3)
    assert items[1]["image"].shape == (8, 8, 3)
