"""BERT encoder parity vs transformers BertModel."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

TINY = dict(vocab_size=64, hidden_size=32, intermediate_size=48,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=64, type_vocab_size=2)


def test_bert_encoder_parity():
    import torch

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.encoders.bert import (BERT_PARAM_NAMES_MAPPING,
                                                    BertArchConfig,
                                                    BertEncoderModel)
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    hf_cfg = transformers.BertConfig(**TINY, hidden_act="gelu",
                                     attention_probs_dropout_prob=0.0,
                                     hidden_dropout_prob=0.0)
    torch.manual_seed(0)
    ref = transformers.BertModel(hf_cfg)
    ref.eval()

    ours = BertEncoderModel(BertArchConfig(**TINY),
                            param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    sd = {k: v for k, v in ref.state_dict().items()
          if "position_ids" not in k}
    n = load_weights(ours, ((k, v.numpy()) for k, v in sd.items()),
                     BERT_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 64, (2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[1, 9:] = 0
    with torch.no_grad():
        ref_out = ref(input_ids=torch.from_numpy(ids),
                      attention_mask=torch.from_numpy(mask))
    out = ours(jnp.asarray(ids), jnp.asarray(mask))

    m = mask[..., None].astype(bool)
    err = np.abs((ref_out.last_hidden_state.numpy() -
                  np.asarray(out.last_hidden_state)) * m).max()
    assert err < 3e-4, f"last_hidden_state max err {err}"
    err = np.abs(ref_out.pooler_output.numpy() -
                 np.asarray(out.pooler_output)).max()
    assert err < 3e-4, f"pooler_output max err {err}"
