"""UMT5/T5 encoder parity vs HuggingFace transformers (installed, CPU)."""

import numpy as np
import pytest


@pytest.fixture(scope="module", params=["umt5", "t5"])
def models(request):
    torch = pytest.importorskip("torch")
    import transformers

    kind = request.param
    kwargs = dict(vocab_size=128, d_model=64, d_kv=16, d_ff=96, num_layers=3,
                  num_heads=4, relative_attention_num_buckets=8,
                  relative_attention_max_distance=16,
                  feed_forward_proj="gated-gelu", is_encoder_decoder=False,
                  tie_word_embeddings=False)
    if kind == "umt5":
        hf_cfg = transformers.UMT5Config(**kwargs)
        hf = transformers.UMT5EncoderModel(hf_cfg)
    else:
        hf_cfg = transformers.T5Config(**kwargs)
        hf = transformers.T5EncoderModel(hf_cfg)
    hf.eval()
    torch.manual_seed(0)
    with torch.no_grad():
        for p in hf.parameters():
            torch.nn.init.normal_(p, std=0.05)

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.encoders.t5 import (
        T5_PARAM_NAMES_MAPPING, T5ArchConfig)
    from fastvideo_tpu.models.encoders.t5 import T5EncoderModel
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    cfg = T5ArchConfig(vocab_size=128, d_model=64, d_kv=16, d_ff=96,
                       num_layers=3, num_heads=4,
                       relative_attention_num_buckets=8,
                       relative_attention_max_distance=16,
                       feed_forward_proj="gated-gelu", is_umt5=(kind == "umt5"))
    ours = T5EncoderModel(cfg, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    sd = {k: v for k, v in hf.state_dict().items()
          if "encoder.embed_tokens" not in k}
    n = load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                     T5_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd)
    return hf, ours


def test_t5_encoder_parity(models):
    import jax.numpy as jnp
    import torch

    hf, ours = models
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 19))
    mask = np.ones((2, 19), dtype=np.int64)
    mask[0, 12:] = 0
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask)
                 ).last_hidden_state.numpy()
    out = np.asarray(
        ours(jnp.asarray(ids), jnp.asarray(mask)).last_hidden_state)
    # padded positions may differ (HF zeroes them via mask in later usage);
    # compare only valid positions
    err = np.abs(ref[0, :12] - out[0, :12]).max()
    err2 = np.abs(ref[1] - out[1]).max()
    scale = np.abs(ref).max()
    assert max(err, err2) / scale < 2e-4, (err, err2, scale)
