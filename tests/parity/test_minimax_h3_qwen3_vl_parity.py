"""MiniMax-H3 Qwen3-VL conditioner parity vs the reference torch model."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

TINY = dict(vocab_size=64, hidden_size=32, intermediate_size=48,
            num_hidden_layers=3, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8,
            mrope_section=(2, 1, 1),
            rope_scaling={"mrope_interleaved": True,
                          "mrope_section": [2, 1, 1],
                          "rope_type": "default"},
            vision_start_token_id=60, vision_end_token_id=63,
            image_token_id=61, video_token_id=62,
            vision_depth=2, vision_hidden_size=16,
            vision_intermediate_size=24, vision_num_heads=2,
            vision_patch_size=2, vision_temporal_patch_size=2,
            vision_spatial_merge_size=2, vision_out_hidden_size=32,
            vision_num_position_embeddings=16,
            vision_deepstack_visual_indexes=(0, 1))


@pytest.fixture(scope="module")
def ref_model():
    try:
        mod = ref_loader.import_ref(
            "fastvideo.models.encoders.minimax_h3_qwen3_vl")
        ref_loader.init_ref_distributed()
        from fastvideo.configs.models.encoders.minimax_h3_qwen3_vl import (
            MiniMaxH3Qwen3VLArchConfig, MiniMaxH3Qwen3VLConfig)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    tiny = dict(TINY)
    tiny["vision_deepstack_visual_indexes"] = tuple(
        tiny["vision_deepstack_visual_indexes"])
    arch = MiniMaxH3Qwen3VLArchConfig(**tiny)
    cfg = MiniMaxH3Qwen3VLConfig(arch_config=arch)
    torch.manual_seed(0)
    model = mod.MiniMaxH3Qwen3VLConditioner(cfg)
    with torch.no_grad():
        for p in model.parameters():
            torch.nn.init.normal_(p, std=0.05)
    model.eval()
    return model


def _build_jax(ref_model):
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.encoders.minimax_h3_qwen3_vl import (
        MINIMAX_H3_QWEN3_VL_PARAM_NAMES_MAPPING, MiniMaxH3Qwen3VLArchConfig,
        MiniMaxH3Qwen3VLConditioner)
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    tiny = {k: v for k, v in TINY.items() if k != "rope_scaling"}
    cfg = MiniMaxH3Qwen3VLArchConfig(**tiny)
    model = MiniMaxH3Qwen3VLConditioner(cfg, param_dtype=jnp.float32,
                                        rngs=nnx.Rngs(0))
    sd = {k: v for k, v in ref_model.state_dict().items()
          if "inv_freq" not in k}
    n = load_weights(model,
                     ((k, v.detach().numpy()) for k, v in sd.items()),
                     MINIMAX_H3_QWEN3_VL_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"
    return model


def test_qwen3_vl_text_only_parity(ref_model):
    import jax.numpy as jnp
    import torch

    ours = _build_jax(ref_model)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 59, (1, 11))
    with torch.no_grad():
        ref_out = ref_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.ones(1, 11, dtype=torch.long),
            output_hidden_states=True)
    out = ours(jnp.asarray(ids), output_hidden_states=True)
    assert len(out.hidden_states) == len(ref_out.hidden_states)
    for i in (0, 2, len(out.hidden_states) - 1):
        ref_h = ref_out.hidden_states[i].numpy()
        err = np.abs(ref_h - np.asarray(out.hidden_states[i])).max()
        assert err < 5e-4, f"hidden_states[{i}] max err {err}"


def test_qwen3_vl_image_parity(ref_model):
    import jax.numpy as jnp
    import torch

    ours = _build_jax(ref_model)
    rng = np.random.default_rng(1)
    # one image: grid (1, 4, 4) -> 16 patches -> 4 merged tokens
    grid = np.asarray([[1, 4, 4]], np.int64)
    patch_dim = 3 * 2 * 2 * 2
    pixels = rng.standard_normal((16, patch_dim)).astype(np.float32)
    ids = np.asarray([[5, 60, 61, 61, 61, 61, 63, 9, 12, 7]], np.int64)
    with torch.no_grad():
        ref_out = ref_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.ones(1, ids.shape[1], dtype=torch.long),
            pixel_values=torch.from_numpy(pixels),
            image_grid_thw=torch.from_numpy(grid),
            output_hidden_states=True)
    out = ours(jnp.asarray(ids), pixel_values=jnp.asarray(pixels),
               image_grid_thw=grid, output_hidden_states=True)
    for i in (1, len(out.hidden_states) - 1):
        ref_h = ref_out.hidden_states[i].numpy()
        err = np.abs(ref_h - np.asarray(out.hidden_states[i])).max()
        assert err < 5e-4, f"hidden_states[{i}] max err {err}"
