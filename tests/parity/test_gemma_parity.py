"""Gemma text encoder parity vs transformers GemmaModel."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

TINY = dict(vocab_size=64, hidden_size=32, intermediate_size=48,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=1, head_dim=16,
            max_position_embeddings=128)


def test_gemma_encoder_parity():
    import torch

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.encoders.gemma import (
        GEMMA_PARAM_NAMES_MAPPING, GemmaArchConfig, GemmaEncoderModel)
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    hf_cfg = transformers.GemmaConfig(**TINY, attention_dropout=0.0,
                                      hidden_act="gelu_pytorch_tanh")
    torch.manual_seed(0)
    ref = transformers.GemmaModel(hf_cfg)
    ref.eval()

    ours = GemmaEncoderModel(GemmaArchConfig(**TINY),
                             param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    sd = {k: v for k, v in ref.state_dict().items()
          if "rotary_emb" not in k}
    n = load_weights(ours, ((k, v.numpy()) for k, v in sd.items()),
                     GEMMA_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 64, (2, 10))
    mask = np.ones((2, 10), np.int64)
    mask[1, 7:] = 0
    with torch.no_grad():
        ref_out = ref(input_ids=torch.from_numpy(ids),
                      attention_mask=torch.from_numpy(mask))
    got = np.asarray(
        ours(jnp.asarray(ids), jnp.asarray(mask)).last_hidden_state)
    ref_h = ref_out.last_hidden_state.numpy()
    m = mask[..., None].astype(bool)
    err = np.abs((ref_h - got) * m).max()
    assert err < 3e-4, f"last_hidden_state max err {err}"
