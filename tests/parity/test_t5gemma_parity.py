"""T5-Gemma encoder parity vs transformers' T5GemmaEncoderModel."""

import numpy as np
import pytest

TINY = dict(vocab_size=64, hidden_size=32, intermediate_size=48,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=1, head_dim=16, sliding_window=4,
            query_pre_attn_scalar=16.0, attn_logit_softcapping=50.0,
            layer_types=("sliding_attention", "full_attention"))


@pytest.fixture(scope="module")
def ref_model():
    try:
        import torch
        from transformers import T5GemmaEncoderModel
        from transformers.models.t5gemma import T5GemmaConfig
        from transformers.models.t5gemma.configuration_t5gemma import (
            T5GemmaModuleConfig)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"transformers t5gemma unavailable: {e}")
    mc = T5GemmaModuleConfig(**{
        **{k: (list(v) if isinstance(v, tuple) else v)
           for k, v in TINY.items()},
        "query_pre_attn_scalar": int(TINY["query_pre_attn_scalar"]),
        "dropout_rate": 0.0,
        "attention_dropout": 0.0,
    })
    mc.vocab_size = TINY["vocab_size"]
    cfg = T5GemmaConfig(encoder=mc, decoder=mc, is_encoder_decoder=False)
    cfg.vocab_size = TINY["vocab_size"]
    torch.manual_seed(0)
    model = T5GemmaEncoderModel(cfg)
    # HF keeps the top-level vocab default; resize to the tiny vocab
    if model.get_input_embeddings().weight.shape[0] != TINY["vocab_size"]:
        model.resize_token_embeddings(TINY["vocab_size"])
    with torch.no_grad():
        for p in model.parameters():
            torch.nn.init.normal_(p, std=0.05)
    model.eval()
    return model


def test_t5gemma_parity(ref_model):
    import jax.numpy as jnp
    import torch
    from flax import nnx

    from fastvideo_tpu.models.encoders.t5gemma import (
        T5GEMMA_PARAM_NAMES_MAPPING, T5GemmaArchConfig, T5GemmaEncoderModel)
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    ours = T5GemmaEncoderModel(T5GemmaArchConfig(**TINY),
                               param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    sd = {k: v for k, v in ref_model.state_dict().items()
          if "rotary" not in k}
    n = load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                     T5GEMMA_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 63, (1, 11))
    mask = np.ones((1, 11), np.int64)
    mask[0, 9:] = 0
    with torch.no_grad():
        ref_out = ref_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    out = np.asarray(
        ours(jnp.asarray(ids), jnp.asarray(mask)).last_hidden_state)
    # positions masked out may differ; compare valid positions
    err = np.abs(ref_out[:, :9] - out[:, :9]).max()
    assert err < 5e-4, f"max err {err}"
