"""`fastvideo preprocess` CLI: videos+captions dir -> training parquet."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_wan_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("wan_tiny_pp")
    return make_tiny_wan_checkpoint(str(root / "Wan2.1-T2V-tiny-Diffusers"))


def test_preprocess_cli_jsonl(ckpt, tmp_path):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.dataset.parquet import LatentsParquetMapStyleDataset
    from fastvideo_tpu.entrypoints.cli.main import main

    par.destroy_mesh()
    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(3):
        frames = rng.integers(0, 255, (5, 16, 16, 3), dtype=np.uint8)
        np.save(data / f"v{i}.npy", frames)
        rows.append({"path": f"v{i}.npy", "caption": f"w{i} w{i+1}"})
    with open(data / "videos.jsonl", "w") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")

    out = tmp_path / "parquet"
    rc = main(["preprocess", "--model-path", ckpt, "--data-path", str(data),
               "--output-dir", str(out), "--samples-per-file", "2"])
    assert rc == 0
    ds = LatentsParquetMapStyleDataset(str(out))
    assert len(ds) == 3
    latents, embeds = ds[0]
    # tiny VAE: z=4 channels, temporal factor 2 -> 3 latent frames
    assert latents.shape[0] == 4 and latents.shape[1] == 3, latents.shape
    assert embeds.shape[-1] == 32
    assert np.isfinite(latents).all() and np.isfinite(embeds).all()
    par.destroy_mesh()


def test_preprocess_cli_data_merge_path(ckpt, tmp_path):
    """--data-merge-path drives the staged VideoCaptionMergedDataset
    (validation + fps resample + transform + tokenize) end to end."""
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.dataset.parquet import LatentsParquetMapStyleDataset
    from fastvideo_tpu.entrypoints.cli.main import main

    par.destroy_mesh()
    folder = tmp_path / "videos"
    folder.mkdir()
    rng = np.random.default_rng(1)
    rows = []
    for i in range(2):
        frames = rng.integers(0, 255, (6, 24, 24, 3), dtype=np.uint8)
        np.save(folder / f"v{i}.npy", frames)
        rows.append({"path": f"v{i}.npy", "cap": f"w{i} w{i+1}",
                     "fps": 4.0, "duration": 1.5})
    # one bad record the validation stage must drop
    rows.append({"path": "missing.npy"})
    anno = tmp_path / "anno.json"
    anno.write_text(json.dumps(rows))
    merge = tmp_path / "merge.txt"
    merge.write_text(f"{folder},{anno}\n")

    out = tmp_path / "parquet"
    rc = main(["preprocess", "--model-path", ckpt,
               "--data-merge-path", str(merge), "--output-dir", str(out),
               "--num-frames", "5", "--train-fps", "4",
               "--max-height", "16", "--max-width", "16"])
    assert rc == 0
    ds = LatentsParquetMapStyleDataset(str(out))
    assert len(ds) == 2
    latents, embeds = ds[0]
    assert latents.shape[0] == 4, latents.shape
    assert np.isfinite(latents).all() and np.isfinite(embeds).all()
    par.destroy_mesh()


def test_preprocess_cli_requires_a_data_source(ckpt):
    from fastvideo_tpu.entrypoints.cli.main import main

    with pytest.raises(SystemExit):
        main(["preprocess", "--model-path", ckpt, "--output-dir", "/tmp/x"])
