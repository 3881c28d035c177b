"""Mistral text encoder parity vs transformers MistralModel."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

TINY = dict(vocab_size=64, hidden_size=32, intermediate_size=48,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=1, head_dim=16,
            max_position_embeddings=128, rope_theta=1000000.0,
            rms_norm_eps=1e-6)


def test_mistral_encoder_parity():
    import torch

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.encoders.mistral import (
        MISTRAL_PARAM_NAMES_MAPPING, MistralArchConfig, MistralEncoderModel)
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    hf_cfg = transformers.MistralConfig(**TINY, attention_dropout=0.0,
                                        sliding_window=None)
    torch.manual_seed(0)
    ref = transformers.MistralModel(hf_cfg)
    ref.eval()

    ours = MistralEncoderModel(MistralArchConfig(**TINY),
                               param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    sd = {k: v for k, v in ref.state_dict().items()
          if "rotary_emb" not in k}
    n = load_weights(ours, ((k, v.numpy()) for k, v in sd.items()),
                     MISTRAL_PARAM_NAMES_MAPPING, strict=True)
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
    m = mask[..., None].astype(bool)
    err = np.abs((ref_out.last_hidden_state.numpy() - got) * m).max()
    assert err < 3e-4, f"last_hidden_state max err {err}"
