"""WanVAE parity: full-clip vectorized JAX decode/encode vs the reference's
feature-cached chunked torch implementation (identical tiny random weights).

This is the critical check that the first-frame-split formulation
(models/vaes/wan.py) reproduces the reference's cache semantics exactly.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

TINY = dict(base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
            attn_scales=(), temperal_downsample=(True,),
            latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4))


@pytest.fixture(scope="module")
def ref_vae():
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    try:
        mod = ref_loader.import_ref("fastvideo.models.vaes.wanvae")
        from fastvideo.configs.models.vaes.wanvae import (WanVAEArchConfig,
                                                          WanVAEConfig)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = WanVAEArchConfig(**TINY)
    cfg = WanVAEConfig(arch_config=arch)
    torch.manual_seed(0)
    vae = mod.AutoencoderKLWan(cfg)
    with torch.no_grad():
        for p in vae.parameters():
            torch.nn.init.normal_(p, std=0.1)
    vae.eval()
    return vae


def _build_jax_vae(ref_vae):
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.vaes.wan import (
        WAN_VAE_PARAM_NAMES_MAPPING, WanVAEArchConfig)
    from fastvideo_tpu.models.loader.weight_utils import load_weights
    from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan

    cfg = WanVAEArchConfig(**TINY)
    vae = AutoencoderKLWan(cfg, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    sd = ref_vae.state_dict()
    n = load_weights(vae, ((k, v.detach().numpy()) for k, v in sd.items()),
                     WAN_VAE_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"
    return vae


def test_wanvae_decode_parity(ref_vae):
    import jax.numpy as jnp
    import torch

    jax_vae = _build_jax_vae(ref_vae)
    rng = np.random.default_rng(0)
    # latent [B, z, T, h, w]; T = 1 + k
    z = rng.standard_normal((1, 4, 3, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_vae.decode(torch.from_numpy(z)).numpy()
    jax_out = np.asarray(jax_vae.decode(jnp.asarray(z)))
    assert ref_out.shape == jax_out.shape, (ref_out.shape, jax_out.shape)
    err = np.abs(ref_out - jax_out).max()
    assert err < 2e-4, f"decode max err {err}"


def test_wanvae_encode_parity(ref_vae):
    import jax.numpy as jnp
    import torch

    jax_vae = _build_jax_vae(ref_vae)
    rng = np.random.default_rng(1)
    # pixels [B, 3, T, H, W]; T = 1 + 4k (temporal factor 2 here -> chunks
    # of 4 still used by the reference's cached encode)
    x = rng.standard_normal((1, 3, 5, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref_dist = ref_vae.encode(torch.from_numpy(x))
        ref_mu = ref_dist.mean.numpy() if hasattr(ref_dist, "mean") else (
            ref_dist.latent_dist.mean.numpy())
    jax_mu = np.asarray(jax_vae.encode(jnp.asarray(x)).mean)
    # jax layout NDHWC -> NCDHW
    jax_mu = jax_mu.transpose(0, 4, 1, 2, 3)
    assert ref_mu.shape == jax_mu.shape, (ref_mu.shape, jax_mu.shape)
    err = np.abs(ref_mu - jax_mu).max()
    assert err < 2e-4, f"encode max err {err}"


TINY22 = dict(base_dim=8, z_dim=6, dim_mult=(2, 2), num_res_blocks=1,
              attn_scales=(), temperal_downsample=(True,),
              latents_mean=tuple([0.0] * 6), latents_std=tuple([1.0] * 6),
              is_residual=True, patch_size=2, in_channels=12, out_channels=12)


@pytest.fixture(scope="module")
def ref_vae22():
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    try:
        mod = ref_loader.import_ref("fastvideo.models.vaes.wanvae")
        from fastvideo.configs.models.vaes.wanvae import (WanVAEArchConfig,
                                                          WanVAEConfig)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = WanVAEArchConfig(**TINY22)
    cfg = WanVAEConfig(arch_config=arch)
    torch.manual_seed(0)
    vae = mod.AutoencoderKLWan(cfg)
    with torch.no_grad():
        for p in vae.parameters():
            torch.nn.init.normal_(p, std=0.1)
    vae.eval()
    return vae


def _build_jax_vae22(ref_vae):
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.vaes.wan import (
        WAN_VAE_PARAM_NAMES_MAPPING, WanVAEArchConfig)
    from fastvideo_tpu.models.loader.weight_utils import load_weights
    from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan

    cfg = WanVAEArchConfig(**TINY22)
    vae = AutoencoderKLWan(cfg, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    sd = ref_vae.state_dict()
    n = load_weights(vae, ((k, v.detach().numpy()) for k, v in sd.items()),
                     WAN_VAE_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"
    return vae


def test_wan22_residual_vae_decode_parity(ref_vae22):
    import jax.numpy as jnp
    import torch

    jax_vae = _build_jax_vae22(ref_vae22)
    rng = np.random.default_rng(3)
    z = rng.standard_normal((1, 6, 3, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_vae22.decode(torch.from_numpy(z)).numpy()
    jax_out = np.asarray(jax_vae.decode(jnp.asarray(z)))
    assert ref_out.shape == jax_out.shape, (ref_out.shape, jax_out.shape)
    err = np.abs(ref_out - jax_out).max()
    assert err < 3e-4, f"decode max err {err}"


def test_wan22_residual_vae_encode_parity(ref_vae22):
    import jax.numpy as jnp
    import torch

    jax_vae = _build_jax_vae22(ref_vae22)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 3, 5, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref_mu = ref_vae22.encode(torch.from_numpy(x)).mean.numpy()
    jax_mu = np.asarray(jax_vae.encode(jnp.asarray(x)).mean).transpose(
        0, 4, 1, 2, 3)
    assert ref_mu.shape == jax_mu.shape, (ref_mu.shape, jax_mu.shape)
    err = np.abs(ref_mu - jax_mu).max()
    assert err < 3e-4, f"encode max err {err}"
