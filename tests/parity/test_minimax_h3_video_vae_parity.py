"""MiniMax-H3 video VAE parity vs the reference torch implementation."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

TINY = dict(latent_channels=4, block_out_channels=(8, 16),
            layers_per_block=1, spatial_downsample_factors=(2, 2),
            temporal_downsample_factors=(1, 2), norm_num_groups=4,
            decoder_num_layers=2, decoder_num_attention_heads=2,
            decoder_attention_head_dim=8, decoder_num_register_tokens=2,
            decoder_ffn_mult=2, decoder_rope_dim_ratio=0.75,
            clip_length=5, token_drop=1,
            latents_mean=(0.1,) * 4, latents_std=(1.5,) * 4)


@pytest.fixture(scope="module")
def ref_vae():
    try:
        mod = ref_loader.import_ref("fastvideo.models.vaes.minimax_h3_video")
        from fastvideo.configs.models.vaes.minimax_h3_video import (
            MiniMaxH3VideoVAEArchConfig, MiniMaxH3VideoVAEConfig)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = MiniMaxH3VideoVAEArchConfig(**TINY)
    cfg = MiniMaxH3VideoVAEConfig(arch_config=arch)
    torch.manual_seed(0)
    vae = mod.AutoencoderKLMiniMaxH3(cfg)
    with torch.no_grad():
        for p in vae.parameters():
            torch.nn.init.normal_(p, std=0.1)
    vae.eval()
    return vae


def _build_jax(ref_vae):
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.loader.weight_utils import load_weights
    from fastvideo_tpu.models.vaes.minimax_h3_video import (
        MINIMAX_H3_VIDEO_VAE_PARAM_NAMES_MAPPING, AutoencoderKLMiniMaxH3,
        MiniMaxH3VideoVAEArchConfig)

    cfg = MiniMaxH3VideoVAEArchConfig(**TINY)
    vae = AutoencoderKLMiniMaxH3(cfg, param_dtype=jnp.float32,
                                 rngs=nnx.Rngs(0))
    sd = ref_vae.state_dict()
    n = load_weights(vae, ((k, v.detach().numpy()) for k, v in sd.items()),
                     MINIMAX_H3_VIDEO_VAE_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"
    return vae


def test_minimax_video_encode_parity(ref_vae):
    import jax.numpy as jnp
    import torch

    jax_vae = _build_jax(ref_vae)
    rng = np.random.default_rng(0)
    # 10 frames = 2 clips of 5; 16x16 spatial (4x compression -> 4x4)
    x = rng.standard_normal((1, 3, 10, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref_moments = ref_vae._encode(torch.from_numpy(x)).numpy()
    moments = np.asarray(jax_vae._encode(jnp.asarray(x)))
    assert ref_moments.shape == moments.shape, (ref_moments.shape,
                                                moments.shape)
    err = np.abs(ref_moments - moments).max()
    assert err < 5e-4, f"encode max err {err}"


def test_minimax_video_decode_parity(ref_vae):
    import jax.numpy as jnp
    import torch

    jax_vae = _build_jax(ref_vae)
    rng = np.random.default_rng(1)
    z = rng.standard_normal((1, 4, 5, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_vae._decode(torch.from_numpy(z)).numpy()
    out = np.asarray(jax_vae.decode(jnp.asarray(z)))
    assert ref_out.shape == out.shape, (ref_out.shape, out.shape)
    err = np.abs(ref_out - out).max()
    assert err < 5e-4, f"decode max err {err}"


def test_minimax_video_keyframe_and_tiling(ref_vae):
    import jax.numpy as jnp
    import torch

    jax_vae = _build_jax(ref_vae)
    rng = np.random.default_rng(2)
    frame = rng.standard_normal((1, 3, 1, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref_m = ref_vae.encode_keyframe(
            torch.from_numpy(frame)).latent_dist.mode().numpy()
    m = np.asarray(jax_vae.encode_keyframe(jnp.asarray(frame)).mode())
    assert np.abs(ref_m - m).max() < 5e-4

    # tiled decode matches the reference tiled decode
    ref_vae.enable_tiling(tile_sample_min_height=8, tile_sample_min_width=8,
                          tile_sample_min_overlap_height=4,
                          tile_sample_min_overlap_width=4)
    jax_vae.enable_tiling(tile_sample_min_height=8, tile_sample_min_width=8,
                          tile_sample_min_overlap_height=4,
                          tile_sample_min_overlap_width=4)
    z = rng.standard_normal((1, 4, 5, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_vae._decode(torch.from_numpy(z)).numpy()
    out = np.asarray(jax_vae.decode(jnp.asarray(z)))
    ref_vae.disable_tiling()
    jax_vae.disable_tiling()
    assert ref_out.shape == out.shape
    assert np.abs(ref_out - out).max() < 5e-4


def test_minimax_video_normalization(ref_vae):
    import jax.numpy as jnp

    jax_vae = _build_jax(ref_vae)
    rng = np.random.default_rng(3)
    lat = rng.standard_normal((1, 4, 2, 3, 3)).astype(np.float32)
    import torch
    with torch.no_grad():
        ref_n = ref_vae.normalize_latents(torch.from_numpy(lat)).numpy()
        ref_d = ref_vae.denormalize_latents(torch.from_numpy(lat)).numpy()
    np.testing.assert_allclose(
        np.asarray(jax_vae.normalize_latents(jnp.asarray(lat))), ref_n,
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jax_vae.denormalize_latents(jnp.asarray(lat))), ref_d,
        rtol=1e-5, atol=1e-6)
