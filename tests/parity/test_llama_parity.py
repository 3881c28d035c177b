"""LLaMA encoder parity vs HuggingFace transformers LlamaModel."""

import numpy as np
import pytest


def test_llama_parity():
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5, rope_theta=10000.0, max_position_embeddings=64)
    hf = transformers.LlamaModel(hf_cfg)
    hf.eval()
    torch.manual_seed(0)
    with torch.no_grad():
        for p in hf.parameters():
            torch.nn.init.normal_(p, std=0.05)

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.encoders.llama import (
        LLAMA_PARAM_NAMES_MAPPING, LlamaArchConfig, LlamaEncoderModel)
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    cfg = LlamaArchConfig(vocab_size=128, hidden_size=64,
                          intermediate_size=96, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=2,
                          rope_theta=10000.0)
    ours = LlamaEncoderModel(cfg, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    sd = {k: v for k, v in hf.state_dict().items()
          if "rotary_emb" not in k}
    n = load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                     LLAMA_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 17))
    mask = np.ones((2, 17), dtype=np.int64)
    mask[0, 12:] = 0
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask)
                 ).last_hidden_state.numpy()
    out = np.asarray(
        ours(jnp.asarray(ids), jnp.asarray(mask)).last_hidden_state)
    err = max(np.abs(ref[0, :12] - out[0, :12]).max(),
              np.abs(ref[1] - out[1]).max())
    scale = np.abs(ref).max()
    assert err / scale < 3e-4, (err, scale)
