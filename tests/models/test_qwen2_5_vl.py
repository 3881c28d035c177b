"""Qwen2.5-VL (Reason1) encoder: vision window indexing, sectioned
mrope, image-token splice (reference models/encoders/
qwen2_5_vl_custom.py + reason1.py)."""

import numpy as np


def _tiny_cfg():
    from fastvideo_tpu.models.encoders.qwen2_5_vl import Qwen25VLArchConfig

    return Qwen25VLArchConfig(
        vocab_size=64, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=12, mrope_section=(2, 2, 2),
        vision_start_token_id=60, image_token_id=61, video_token_id=62,
        vision_depth=2, vision_hidden_size=32,
        vision_intermediate_size=48, vision_num_heads=2,
        vision_patch_size=2, vision_temporal_patch_size=1,
        vision_spatial_merge_size=2, vision_window_size=8,
        vision_out_hidden_size=48, vision_fullatt_block_indexes=(1,))


def test_window_index_roundtrip():
    from fastvideo_tpu.models.encoders.qwen2_5_vl import (
        vision_window_index)

    grid = np.array([[1, 8, 8]])
    idx, cu = vision_window_index(grid, window_size=8,
                                  spatial_merge_size=2, patch_size=2)
    # permutation over 16 merge units
    assert sorted(idx.tolist()) == list(range(16))
    assert cu[0] == 0 and cu[-1] == 64  # all patch tokens covered
    assert (np.diff(cu) > 0).all()


def test_sectioned_mrope_text_equals_1d():
    from fastvideo_tpu.models.encoders.qwen2_5_vl import (
        sectioned_mrope_cos_sin)

    pos = np.broadcast_to(np.arange(6)[None, None], (3, 1, 6)).copy()
    cos, sin = sectioned_mrope_cos_sin(pos, 12, 10000.0, (2, 2, 2))
    # text-only (equal t/h/w ids) must reduce to plain 1-D rope
    inv = 1.0 / 10000.0 ** (np.arange(0, 12, 2) / 12)
    ref = np.cos(np.arange(6)[:, None] * inv)
    np.testing.assert_allclose(cos[0, :, :6], ref, rtol=1e-5)


def test_vl_forward_image_changes_hidden():
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.encoders.qwen2_5_vl import (
        Qwen25VLForConditionalGeneration)

    cfg = _tiny_cfg()
    model = Qwen25VLForConditionalGeneration(cfg, param_dtype=jnp.float32,
                                             rngs=nnx.Rngs(0))
    # one 8x8-patch image -> 16 merged tokens
    n_tokens = 16
    ids = np.full((1, 4 + n_tokens), 3, np.int64)
    ids[0, 0] = 1
    ids[0, 1] = cfg.vision_start_token_id
    ids[0, 2:2 + n_tokens] = cfg.image_token_id
    rng = np.random.default_rng(0)
    feats = cfg.vision_in_channels * cfg.vision_temporal_patch_size * \
        cfg.vision_patch_size**2
    pixels = rng.standard_normal((64, feats)).astype(np.float32)
    grid = np.array([[1, 8, 8]])

    out = model(jnp.asarray(ids), pixel_values=jnp.asarray(pixels),
                image_grid_thw=grid)
    assert out.last_hidden_state.shape == (1, 4 + n_tokens, 48)
    # (embed, 2 layers, final norm) for the full-concat postprocess
    assert len(out.hidden_states) == 4
    assert np.isfinite(np.asarray(out.last_hidden_state)).all()

    out2 = model(jnp.asarray(ids),
                 pixel_values=jnp.asarray(pixels + 1.0),
                 image_grid_thw=grid)
    assert np.abs(np.asarray(out.last_hidden_state) -
                  np.asarray(out2.last_hidden_state)).max() > 1e-4

    # text-only path works without pixels
    text = model(jnp.asarray(np.full((1, 8), 3, np.int64)))
    assert text.last_hidden_state.shape == (1, 8, 48)


def test_registry_resolves():
    from fastvideo_tpu.models.encoders.qwen2_5_vl import (
        Qwen25VLForConditionalGeneration)
    from fastvideo_tpu.models.registry import resolve_model_cls

    cls, _ = resolve_model_cls("Qwen2_5_VLForConditionalGenerationSimple")
    assert cls is Qwen25VLForConditionalGeneration
