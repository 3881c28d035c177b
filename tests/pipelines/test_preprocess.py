"""Preprocess pipeline -> parquet -> training dataloader roundtrip."""

import numpy as np


def test_preprocess_to_training_data(tmp_path):
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.encoders.t5 import T5ArchConfig
    from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig
    from fastvideo_tpu.dataset.parquet import build_parquet_dataloader
    from fastvideo_tpu.models.encoders.t5 import T5EncoderModel
    from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan
    from fastvideo_tpu.pipelines.preprocess.preprocess_pipeline import (
        PreprocessPipeline)

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from utils import TINY_T5, TINY_VAE, _make_tokenizer

    vae = AutoencoderKLWan(
        WanVAEArchConfig(**{k: tuple(v) if isinstance(v, list) else v
                            for k, v in TINY_VAE.items()}),
        param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    enc = T5EncoderModel(
        T5ArchConfig(**{k: v for k, v in TINY_T5.items()
                        if k != "model_type"}, is_umt5=True),
        param_dtype=jnp.float32, rngs=nnx.Rngs(1))
    tok_dir = str(tmp_path / "tok")
    _make_tokenizer(tok_dir, TINY_T5["vocab_size"])
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(tok_dir)

    pipe = PreprocessPipeline(vae, enc, tokenizer, text_len=16)
    rng = np.random.default_rng(0)
    samples = [{
        "id": f"clip{i}",
        "frames": rng.integers(0, 255, size=(5, 16, 16, 3), dtype=np.uint8),
        "caption": f"w{i} w{i+1}",
    } for i in range(4)]
    out_dir = str(tmp_path / "data")
    n = pipe.run(samples, out_dir)
    assert n == 4

    loader = build_parquet_dataloader(out_dir, batch_size=2, accum=1)
    lat, txt = next(loader)
    # z=4, temporal factor 2: 5 frames -> 3 latent frames; 16/2=8 spatial
    assert lat.shape == (1, 2, 4, 3, 8, 8), lat.shape
    assert txt.shape == (1, 2, 16, TINY_T5["d_model"])


def _tiny_components(tmp_path):
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.encoders.t5 import T5ArchConfig
    from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig
    from fastvideo_tpu.models.encoders.t5 import T5EncoderModel
    from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from utils import TINY_T5, TINY_VAE, _make_tokenizer

    vae = AutoencoderKLWan(
        WanVAEArchConfig(**{k: tuple(v) if isinstance(v, list) else v
                            for k, v in TINY_VAE.items()}),
        param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    enc = T5EncoderModel(
        T5ArchConfig(**{k: v for k, v in TINY_T5.items()
                        if k != "model_type"}, is_umt5=True),
        param_dtype=jnp.float32, rngs=nnx.Rngs(1))
    tok_dir = str(tmp_path / "tok")
    _make_tokenizer(tok_dir, TINY_T5["vocab_size"])
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(tok_dir)
    return vae, enc, tokenizer


def test_preprocess_i2v_roundtrip(tmp_path):
    """I2V records carry first-frame CLIP feature + VAE latent columns."""
    from fastvideo_tpu.dataset.parquet import LatentsParquetMapStyleDataset
    from fastvideo_tpu.pipelines.preprocess.preprocess_pipeline_i2v import (
        PreprocessPipelineI2V)

    vae, enc, tokenizer = _tiny_components(tmp_path)
    pipe = PreprocessPipelineI2V(vae, enc, tokenizer, text_len=16)
    rng = np.random.default_rng(0)
    samples = [{
        "id": f"clip{i}",
        "frames": rng.integers(0, 255, size=(5, 16, 16, 3), dtype=np.uint8),
        "caption": f"w{i} w{i+1}",
    } for i in range(3)]
    out_dir = str(tmp_path / "i2v")
    assert pipe.run(samples, out_dir) == 3

    ds = LatentsParquetMapStyleDataset(
        out_dir, extra_columns=("clip_feature", "first_frame_latent"))
    lat, txt, extras = ds[0]
    assert lat.shape == (4, 3, 8, 8)
    # first frame alone: 1 pixel frame -> 1 latent frame
    assert extras["first_frame_latent"].shape == (4, 1, 8, 8)
    assert extras["clip_feature"].ndim == 2


def test_preprocess_ode_trajectory(tmp_path):
    """ODE workload: teacher trajectories a distill method can consume."""
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.dataset.parquet import build_ode_dataloader
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel
    from fastvideo_tpu.pipelines.preprocess.preprocess_pipeline_ode import (
        PreprocessPipelineODE)

    vae, enc, tokenizer = _tiny_components(tmp_path)
    from utils import TINY_T5

    dit = WanTransformer3DModel(
        WanArchConfig(num_attention_heads=2, attention_head_dim=8,
                      in_channels=4, out_channels=4,
                      text_dim=TINY_T5["d_model"], freq_dim=16, ffn_dim=32,
                      num_layers=2),
        param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    steps = 4
    pipe = PreprocessPipelineODE(vae, enc, tokenizer, dit,
                                 num_inference_steps=steps,
                                 guidance_scale=1.0,
                                 latent_shape=(4, 2, 8, 8), text_len=16)
    out_dir = str(tmp_path / "ode")
    n = pipe.run([{"id": "a", "caption": "w1 w2"},
                  {"id": "b", "caption": "w3"}], out_dir)
    assert n == 2

    loader = build_ode_dataloader(out_dir, batch_size=2)
    traj, tsteps, embeds = next(loader)
    assert traj.shape == (2, steps, 4, 2, 8, 8), traj.shape
    assert tsteps.shape == (2, steps)
    # monotone decreasing solver timesteps (denoising direction)
    assert (np.diff(tsteps[0]) < 0).all()
    assert embeds.shape[0] == 2 and embeds.shape[2] == TINY_T5["d_model"]
    assert np.isfinite(traj).all()
