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
