"""CausalLM KV-cache decoding vs naive full-forward generation."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def _tiny_lm(tie=False):
    from fastvideo_tpu.models.encoders.llama import (LlamaArchConfig,
                                                     LlamaEncoderModel)
    from fastvideo_tpu.models.lm import CausalLM

    cfg = LlamaArchConfig(vocab_size=64, hidden_size=32,
                          intermediate_size=64, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=2,
                          rope_theta=10000.0, max_position_embeddings=64)
    trunk = LlamaEncoderModel(cfg, param_dtype=jnp.float32,
                              rngs=nnx.Rngs(0))
    return CausalLM(trunk, tie_word_embeddings=tie,
                    param_dtype=jnp.float32, rngs=nnx.Rngs(1))


def _naive_greedy(lm, ids, n_steps):
    """Re-run the full trunk each step; argmax next token."""
    ids = list(np.asarray(ids)[0])
    logits_seq = []
    for _ in range(n_steps):
        arr = jnp.asarray([ids])
        out = lm.trunk(arr)
        logits = lm._logits(out.last_hidden_state[:, -1])
        logits_seq.append(np.asarray(logits)[0])
        ids.append(int(jnp.argmax(logits, axis=-1)[0]))
    return ids[-n_steps:], np.stack(logits_seq)


def test_cached_greedy_matches_naive():
    lm = _tiny_lm()
    ids = jnp.asarray([[3, 11, 25, 7]])
    mask = jnp.ones_like(ids)
    res = lm.generate(ids, mask, max_new_tokens=5)
    naive_tokens, naive_logits = _naive_greedy(lm, ids, 5)
    np.testing.assert_array_equal(np.asarray(res.tokens)[0], naive_tokens)
    np.testing.assert_allclose(np.asarray(res.scores)[0], naive_logits,
                               atol=2e-4, rtol=2e-4)
    assert int(res.num_tokens[0]) == 5


def test_eos_stops_and_tied_head():
    lm = _tiny_lm(tie=True)
    ids = jnp.asarray([[5, 9]])
    mask = jnp.ones_like(ids)
    res = lm.generate(ids, mask, max_new_tokens=6)
    # force the first generated token to be "eos" and regenerate
    eos = int(np.asarray(res.tokens)[0, 0])
    res2 = lm.generate(ids, mask, max_new_tokens=6, eos_token_id=eos)
    assert int(res2.num_tokens[0]) == 1
    assert np.all(np.asarray(res2.tokens)[0] == eos)


def test_sampled_generation_runs():
    lm = _tiny_lm()
    ids = jnp.asarray([[1, 2, 3]])
    mask = jnp.ones_like(ids)
    r1 = lm.generate(ids, mask, max_new_tokens=4, temperature=1.0,
                     key=jax.random.PRNGKey(0))
    r2 = lm.generate(ids, mask, max_new_tokens=4, temperature=1.0,
                     key=jax.random.PRNGKey(1))
    assert r1.tokens.shape == (1, 4)
    # different keys should (overwhelmingly) give different samples
    assert not np.array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))
