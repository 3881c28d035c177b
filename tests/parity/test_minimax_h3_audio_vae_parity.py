"""MiniMax-H3 audio VAE parity vs the reference torch implementation."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

TINY = dict(encoder_dim=8, encoder_rates=(2, 2), latent_dim=32,
            latent_channels=4, num_attention_heads=2, decoder_dim=16,
            decoder_rates=(2, 2), decoder_kernel_sizes=(4, 4),
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
            latents_mean=(0.2,) * 4, latents_std=(1.2,) * 4)


@pytest.fixture(scope="module")
def ref_vae():
    try:
        mod = ref_loader.import_ref("fastvideo.models.vaes.minimax_h3_audio")
        from fastvideo.configs.models.vaes.minimax_h3_audio import (
            MiniMaxH3AudioVAEArchConfig, MiniMaxH3AudioVAEConfig)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = MiniMaxH3AudioVAEArchConfig(**{
        **TINY, "latents_mean": list(TINY["latents_mean"]),
        "latents_std": list(TINY["latents_std"])
    })
    cfg = MiniMaxH3AudioVAEConfig(arch_config=arch)
    torch.manual_seed(0)
    vae = mod.MiniMaxH3AudioVAE(cfg)
    with torch.no_grad():
        for p in vae.parameters():
            torch.nn.init.normal_(p, std=0.1)
    vae.eval()
    return vae


def _build_jax(ref_vae):
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.loader.weight_utils import load_weights
    from fastvideo_tpu.models.vaes.minimax_h3_audio import (
        MiniMaxH3AudioVAE, MiniMaxH3AudioVAEArchConfig)

    cfg = MiniMaxH3AudioVAEArchConfig(**TINY)
    vae = MiniMaxH3AudioVAE(cfg, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    sd = {k: v for k, v in ref_vae.state_dict().items()
          if not k.endswith(".filter")}  # anti-aliasing filters are const
    n = load_weights(vae, ((k, v.detach().numpy()) for k, v in sd.items()),
                     None, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"
    return vae


def test_minimax_audio_encode_parity(ref_vae):
    import jax.numpy as jnp
    import torch

    jax_vae = _build_jax(ref_vae)
    rng = np.random.default_rng(0)
    wav = (0.5 * rng.standard_normal((1, 1, 37))).astype(np.float32)
    with torch.no_grad():
        ref_post = ref_vae.encode(torch.from_numpy(wav)).latent_dist
        ref_mean = ref_post.mean.numpy()
        ref_std = ref_post.std.numpy()
    post = jax_vae.encode(jnp.asarray(wav))
    assert ref_mean.shape == post.mean.shape
    assert np.abs(ref_mean - np.asarray(post.mean)).max() < 5e-4
    assert np.abs(ref_std - np.asarray(post.std)).max() < 5e-4


def test_minimax_audio_decode_parity(ref_vae):
    import jax.numpy as jnp
    import torch

    jax_vae = _build_jax(ref_vae)
    rng = np.random.default_rng(1)
    z = rng.standard_normal((1, 4, 6)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_vae.decode(torch.from_numpy(z)).sample.numpy()
    out = np.asarray(jax_vae.decode(jnp.asarray(z)))
    assert ref_out.shape == out.shape, (ref_out.shape, out.shape)
    err = np.abs(ref_out - out).max()
    assert err < 5e-4, f"decode max err {err}"
    assert out.max() <= 1.0 and out.min() >= -1.0


def test_minimax_audio_normalization(ref_vae):
    import jax.numpy as jnp
    import torch

    jax_vae = _build_jax(ref_vae)
    rng = np.random.default_rng(2)
    lat = rng.standard_normal((1, 4, 5)).astype(np.float32)
    with torch.no_grad():
        ref_n = ref_vae.normalize_latents(torch.from_numpy(lat)).numpy()
    np.testing.assert_allclose(
        np.asarray(jax_vae.normalize_latents(jnp.asarray(lat))), ref_n,
        rtol=1e-5, atol=1e-6)
