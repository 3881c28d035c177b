"""YAML train entrypoint: config parse -> pipeline build -> steps run."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_wan_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("wan_tiny_train")
    return make_tiny_wan_checkpoint(str(root / "Wan2.1-T2V-tiny-Diffusers"))


@pytest.fixture(scope="module")
def parquet_dir(tmp_path_factory):
    from fastvideo_tpu.dataset.parquet import (record_from_sample,
                                               write_parquet_dataset)

    rng = np.random.default_rng(0)
    records = [
        record_from_sample(f"s{i}",
                           rng.standard_normal((4, 2, 8, 8)).astype(
                               np.float32),
                           rng.standard_normal((8, 32)).astype(np.float32),
                           caption=f"cap {i}")
        for i in range(4)
    ]
    out = tmp_path_factory.mktemp("parquet")
    write_parquet_dataset(records, str(out))
    return str(out)


def test_train_config_build_and_step(ckpt, parquet_dir, tmp_path):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.entrypoints.cli.train import (build_from_config,
                                                     load_train_config)

    cfg_path = tmp_path / "train.yaml"
    cfg_path.write_text(f"""
method: sft
model:
  pretrained_model_path: {ckpt}
  dit_precision: fp32
data:
  path: {parquet_dir}
  batch_size: 1
training:
  learning_rate: 0.001
  max_train_steps: 2
  num_gpus: 1
  output_dir: {tmp_path}/out
  checkpointing_steps: 0
""")
    par.destroy_mesh()
    cfg = load_train_config(str(cfg_path))
    assert cfg.method == "sft"
    assert cfg.training["max_train_steps"] == 2
    pipeline, dataloader = build_from_config(cfg)
    pipeline.train(dataloader, max_steps=2, log_every=1)
    assert pipeline.state.step == 2
    par.destroy_mesh()


def test_train_config_rejects_unknown_fields(tmp_path):
    from fastvideo_tpu.api.errors import UnknownFieldError
    from fastvideo_tpu.entrypoints.cli.train import load_train_config

    bad = tmp_path / "bad.yaml"
    bad.write_text("method: sft\nmodle:\n  pretrained_model_path: /x\n")
    with pytest.raises(UnknownFieldError):
        load_train_config(str(bad))


def test_train_config_rejects_unknown_training_key(ckpt, tmp_path):
    from fastvideo_tpu.entrypoints.cli.train import (build_from_config,
                                                     load_train_config)

    p = tmp_path / "t.yaml"
    p.write_text(f"""
method: sft
model:
  pretrained_model_path: {ckpt}
training:
  leraning_rate: 0.1
""")
    cfg = load_train_config(str(p))
    with pytest.raises(ValueError, match="leraning_rate"):
        build_from_config(cfg)
