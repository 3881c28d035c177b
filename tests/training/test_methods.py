"""Training-method plugin layer: registry, _target_ resolution, kd/dfsft.

Mirrors the reference's method plugin architecture
(/root/reference/fastvideo/train/trainer.py resolves methods from YAML via
train/utils/instantiate.py; methods live in train/methods/*)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_wan_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("wan_tiny_methods")
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
    out = tmp_path_factory.mktemp("parquet_methods")
    write_parquet_dataset(records, str(out))
    return str(out)


def test_registry_lists_builtin_methods():
    from fastvideo_tpu.training.methods import list_methods

    names = list_methods()
    for expected in ("sft", "dmd2", "self_forcing", "kd", "dfsft"):
        assert expected in names, names


def test_resolve_by_name_and_target():
    from fastvideo_tpu.training.methods import resolve_method
    from fastvideo_tpu.training.methods.fine_tuning import SFTMethod

    assert resolve_method("sft") is SFTMethod
    assert resolve_method(
        "fastvideo_tpu.training.methods.fine_tuning.SFTMethod") is SFTMethod
    assert resolve_method({
        "_target_": "fastvideo_tpu.training.methods.fine_tuning.SFTMethod"
    }) is SFTMethod
    with pytest.raises(ValueError, match="Unknown training method"):
        resolve_method("nope")


def test_instantiate_filters_kwargs():
    from fastvideo_tpu.training.instantiate import instantiate

    obj = instantiate({
        "_target_": "fastvideo_tpu.training.run_config.ModelSpec",
        "pretrained_model_path": "/x",
        "bogus_key": 1,
    })
    assert obj.pretrained_model_path == "/x"


def test_kd_method_trains(ckpt, parquet_dir, tmp_path):
    """kd through the plugin path: teacher rollout -> student step; loss
    finite and params update."""
    import jax

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.entrypoints.cli.train import (build_from_config,
                                                     load_train_config)

    cfg_path = tmp_path / "kd.yaml"
    cfg_path.write_text(f"""
method: kd
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
method_config:
  t_list: [999, 624]
""")
    par.destroy_mesh()
    cfg = load_train_config(str(cfg_path))
    method, dataloader = build_from_config(cfg)
    before = jax.tree.map(lambda x: np.asarray(x).copy(),
                          jax.tree.leaves(method.params)[0])
    method.train(dataloader, max_steps=2)
    assert method.step == 2
    after = np.asarray(jax.tree.leaves(method.params)[0])
    assert not np.allclose(before, after)
    par.destroy_mesh()


def test_kd_cache_roundtrip(ckpt, parquet_dir, tmp_path):
    """Teacher trajectories cached to npz; COMPLETE sentinel; training
    consumes the cache."""
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.entrypoints.cli.train import (build_from_config,
                                                     load_train_config)

    cache = tmp_path / "kd_cache"
    cfg_path = tmp_path / "kd.yaml"
    cfg_path.write_text(f"""
method: kd
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
method_config:
  t_list: [999, 624]
  teacher_path_cache: {cache}
""")
    par.destroy_mesh()
    cfg = load_train_config(str(cfg_path))
    method, dataloader = build_from_config(cfg)
    method.train(dataloader, max_steps=2)
    assert (cache / "COMPLETE").exists()
    npzs = [f for f in os.listdir(cache) if f.endswith(".npz")]
    assert len(npzs) >= 1
    d = np.load(cache / npzs[0])
    assert d["trajectory"].shape[0] == 2  # S == len(t_list)
    par.destroy_mesh()


@pytest.fixture(scope="module")
def causal_ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("wan_tiny_causal")
    return make_tiny_wan_checkpoint(
        str(root / "CausalWan-tiny-Diffusers"), causal=True)


@pytest.mark.parametrize("method_name", ["dfsft", "tfsft"])
def test_diffusion_forcing_methods_train(causal_ckpt, parquet_dir, tmp_path,
                                         method_name):
    """dfsft/tfsft: per-chunk inhomogeneous timesteps on the causal student
    (reference train/methods/fine_tuning/{dfsft,tfsft}.py)."""
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.entrypoints.cli.train import (build_from_config,
                                                     load_train_config)

    cfg_path = tmp_path / f"{method_name}.yaml"
    cfg_path.write_text(f"""
method: {method_name}
model:
  pretrained_model_path: {causal_ckpt}
  dit_precision: fp32
data:
  path: {parquet_dir}
  batch_size: 1
training:
  learning_rate: 0.001
  max_train_steps: 2
  num_gpus: 1
method_config:
  chunk_size: 2
  min_timestep_ratio: 0.2
  max_timestep_ratio: 0.9
""")
    par.destroy_mesh()
    cfg = load_train_config(str(cfg_path))
    method, dataloader = build_from_config(cfg)
    method.train(dataloader, max_steps=2)
    assert method.pipeline.state.step == 2
    par.destroy_mesh()


def test_dfsft_rejects_chunk_mismatch(causal_ckpt, parquet_dir, tmp_path):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.entrypoints.cli.train import (build_from_config,
                                                     load_train_config)

    cfg_path = tmp_path / "bad.yaml"
    cfg_path.write_text(f"""
method: dfsft
model:
  pretrained_model_path: {causal_ckpt}
  dit_precision: fp32
data:
  path: {parquet_dir}
  batch_size: 1
training:
  learning_rate: 0.001
  max_train_steps: 1
  num_gpus: 1
method_config:
  chunk_size: 3
""")
    par.destroy_mesh()
    cfg = load_train_config(str(cfg_path))
    with pytest.raises(ValueError, match="num_frames_per_block"):
        build_from_config(cfg)
    par.destroy_mesh()


def test_anyflow_pretrain_method_trains(ckpt, parquet_dir, tmp_path):
    """anyflow_pretrain: dual-timestep r_embedder trunk + central-difference
    flow-map target (reference train/methods/distribution_matching/
    anyflow_pretrain.py)."""
    import jax
    import numpy as np

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.entrypoints.cli.train import (build_from_config,
                                                     load_train_config)

    cfg_path = tmp_path / "afp.yaml"
    cfg_path.write_text(f"""
method: anyflow_pretrain
model:
  pretrained_model_path: {ckpt}
  dit_precision: fp32
data:
  path: {parquet_dir}
  batch_size: 2
training:
  learning_rate: 0.001
  max_train_steps: 2
  num_gpus: 1
method_config:
  diffusion_ratio: 0.5
  consistency_ratio: 0.5
  epsilon: 5.0
  weight_type: beta08
""")
    par.destroy_mesh()
    cfg = load_train_config(str(cfg_path))
    method, dataloader = build_from_config(cfg)

    # delta_embedder initialized as a copy of time_embedder (the tiny ckpt
    # has no delta weights; reference wanvideo.py:102-104 deepcopy)
    ce = method.pipeline.transformer.condition_embedder
    t_w = np.asarray(ce.time_embedder.mlp.fc_in.kernel.value)
    d_w = np.asarray(ce.delta_embedder.mlp.fc_in.kernel.value)
    np.testing.assert_allclose(t_w, d_w)

    before = np.asarray(jax.tree.leaves(method.pipeline.state.params)[0])
    method.train(dataloader, max_steps=2)
    assert method.pipeline.state.step == 2
    after = np.asarray(jax.tree.leaves(method.pipeline.state.params)[0])
    assert not np.allclose(before, after)
    par.destroy_mesh()
