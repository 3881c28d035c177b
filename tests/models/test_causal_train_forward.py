"""Causal Wan full-sequence training forward vs the streaming path.

The diffusion-forcing ``train_forward`` (blockwise-causal flash mask,
per-frame timesteps) must equal running the same weights chunk-by-chunk
through the rolling-KV ``forward_block`` streaming path (reference
causal_wanvideo.py: the flex-attention block mask reproduces exactly what
autoregressive inference sees)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def model():
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.models.dits.causal_wan import (
        CausalWanTransformer3DModel)

    cfg = WanArchConfig(num_attention_heads=2, attention_head_dim=8,
                        in_channels=4, out_channels=4, text_dim=16,
                        freq_dim=16, ffn_dim=32, num_layers=2,
                        patch_size=(1, 2, 2), num_frames_per_block=2,
                        local_attn_size=-1, sink_size=0)
    return CausalWanTransformer3DModel(cfg, param_dtype=jnp.float32,
                                       rngs=nnx.Rngs(0))


def test_train_forward_matches_streaming(model):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    b, c, t, h, w = 1, 4, 4, 8, 8
    chunk = model.config.num_frames_per_block
    lat = jnp.asarray(rng.standard_normal((b, c, t, h, w)), jnp.float32)
    embeds = jnp.asarray(rng.standard_normal((b, 6, 16)), jnp.float32)

    # per-chunk timesteps, constant within a chunk
    t_chunks = [800.0, 350.0]
    t_frame = jnp.asarray([[tc for tc in t_chunks for _ in range(chunk)]],
                          jnp.float32)

    full = model.train_forward(lat, embeds, t_frame)

    # streaming: same weights, chunk by chunk with rolling caches
    fs = (h // 2) * (w // 2)
    caches = model.init_caches(b, fs, dtype=jnp.float32)
    ca = model.init_crossattn_caches()
    outs = []
    for i, tc in enumerate(t_chunks):
        blk = lat[:, :, i * chunk:(i + 1) * chunk]
        pred, caches = model.forward_block(
            blk, embeds, jnp.full((b,), tc, jnp.float32), caches, ca,
            start_frame=i * chunk)
        outs.append(pred)
    stream = jnp.concatenate(outs, axis=2)

    err = float(jnp.max(jnp.abs(full - stream)))
    assert err < 2e-4, err


def test_teacher_forcing_first_chunk_matches_df(model):
    """Chunk 0 has no clean context, so teacher forcing cannot change it."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    b, c, t, h, w = 1, 4, 4, 8, 8
    chunk = model.config.num_frames_per_block
    noisy = jnp.asarray(rng.standard_normal((b, c, t, h, w)), jnp.float32)
    clean = jnp.asarray(rng.standard_normal((b, c, t, h, w)), jnp.float32)
    embeds = jnp.asarray(rng.standard_normal((b, 6, 16)), jnp.float32)
    t_frame = jnp.full((b, t), 500.0, jnp.float32)

    df = model.train_forward(noisy, embeds, t_frame)
    tf = model.train_forward(noisy, embeds, t_frame, clean_x=clean)

    first = slice(0, chunk)
    err0 = float(jnp.max(jnp.abs(df[:, :, first] - tf[:, :, first])))
    assert err0 < 1e-5, err0
    # later chunks DO see the clean context -> outputs must differ
    diff_late = float(jnp.max(jnp.abs(df[:, :, chunk:] - tf[:, :, chunk:])))
    assert diff_late > 1e-4, diff_late
