"""Qwen2.5 text encoder parity vs transformers Qwen2Model."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

TINY = dict(vocab_size=64, hidden_size=32, intermediate_size=48,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=1, max_position_embeddings=128,
            rope_theta=1000000.0)


def test_qwen2_encoder_parity():
    import torch

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.encoders.qwen2_5 import (
        QWEN2_PARAM_NAMES_MAPPING, Qwen2ArchConfig, Qwen2EncoderModel)
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    hf_cfg = transformers.Qwen2Config(**TINY, attention_dropout=0.0)
    torch.manual_seed(0)
    ref = transformers.Qwen2Model(hf_cfg)
    ref.eval()

    ours = Qwen2EncoderModel(Qwen2ArchConfig(**TINY),
                             param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    sd = {k: v for k, v in ref.state_dict().items()
          if "rotary_emb" not in k}
    n = load_weights(ours, ((k, v.numpy()) for k, v in sd.items()),
                     QWEN2_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 64, (2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[1, 9:] = 0
    with torch.no_grad():
        ref_out = ref(input_ids=torch.from_numpy(ids),
                      attention_mask=torch.from_numpy(mask),
                      output_hidden_states=True)
    out = ours(jnp.asarray(ids), jnp.asarray(mask),
               output_hidden_states=True)

    ref_h = ref_out.last_hidden_state.numpy()
    got = np.asarray(out.last_hidden_state)
    # compare on unmasked positions
    m = mask[..., None].astype(bool)
    err = np.abs((ref_h - got) * m).max()
    assert err < 2e-4, f"last_hidden_state max err {err}"

    # intermediate hidden state too (used by downstream conditioners)
    ref_mid = ref_out.hidden_states[1].numpy()
    got_mid = np.asarray(out.hidden_states[1])
    err = np.abs((ref_mid - got_mid) * m).max()
    assert err < 2e-4, f"hidden_states[1] max err {err}"
