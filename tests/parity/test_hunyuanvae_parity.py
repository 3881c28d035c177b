"""Hunyuan VAE parity: JAX channels-last implementation vs the reference
torch AutoencoderKLHunyuanVideo (identical tiny random weights)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

TINY = dict(latent_channels=4, block_out_channels=(8, 16, 16, 16),
            layers_per_block=1, norm_num_groups=4)


@pytest.fixture(scope="module")
def ref_vae():
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    try:
        mod = ref_loader.import_ref("fastvideo.models.vaes.hunyuanvae")
        from fastvideo.configs.models.vaes.hunyuanvae import (
            HunyuanVAEArchConfig, HunyuanVAEConfig)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = HunyuanVAEArchConfig(**TINY)
    cfg = HunyuanVAEConfig(arch_config=arch)
    torch.manual_seed(0)
    vae = mod.AutoencoderKLHunyuanVideo(cfg)
    with torch.no_grad():
        for p in vae.parameters():
            torch.nn.init.normal_(p, std=0.1)
    vae.eval()
    return vae


def _build_jax_vae(ref_vae):
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.loader.weight_utils import load_weights
    from fastvideo_tpu.models.vaes.hunyuan import (
        HUNYUAN_VAE_PARAM_NAMES_MAPPING, AutoencoderKLHunyuanVideo,
        HunyuanVAEArchConfig)

    cfg = HunyuanVAEArchConfig(**TINY)
    vae = AutoencoderKLHunyuanVideo(cfg, param_dtype=jnp.float32,
                                    rngs=nnx.Rngs(0))
    sd = ref_vae.state_dict()
    n = load_weights(vae, ((k, v.detach().numpy()) for k, v in sd.items()),
                     HUNYUAN_VAE_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"
    return vae


def test_hunyuanvae_decode_parity(ref_vae):
    import jax.numpy as jnp
    import torch

    jax_vae = _build_jax_vae(ref_vae)
    rng = np.random.default_rng(0)
    z = rng.standard_normal((1, 4, 2, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_vae._decode(torch.from_numpy(z)).numpy()
    jax_out = np.asarray(jax_vae.decode(jnp.asarray(z)))
    assert ref_out.shape == jax_out.shape, (ref_out.shape, jax_out.shape)
    err = np.abs(ref_out - jax_out).max()
    assert err < 3e-4, f"decode max err {err}"


def test_hunyuanvae_encode_parity(ref_vae):
    import jax.numpy as jnp
    import torch

    jax_vae = _build_jax_vae(ref_vae)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 5, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref_mu = ref_vae._encode(torch.from_numpy(x)).numpy()
    # our encode returns a distribution over channels-last moments
    dist = jax_vae.encode(jnp.asarray(x))
    jax_moments = np.asarray(dist.parameters).transpose(0, 4, 1, 2, 3)
    assert ref_mu.shape == jax_moments.shape, (ref_mu.shape,
                                               jax_moments.shape)
    err = np.abs(ref_mu - jax_moments).max()
    assert err < 3e-4, f"encode max err {err}"
