"""HYWorld VAE parity: the reference's chunked-cache encode/decode must
equal our full-clip hy1.5 VAE computation (the cache streaming is a memory
optimization, not different math — reference hyworldvae.py:786-988 reuses
the HunyuanVideo-1.5 architecture)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

TINY = dict(latent_channels=4, block_out_channels=(8, 16, 16, 16, 16),
            layers_per_block=1, temporal_compression_ratio=4,
            spatial_compression_ratio=16)


@pytest.fixture(scope="module")
def ref_vae():
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    try:
        mod = ref_loader.import_ref("fastvideo.models.vaes.hyworldvae")
        from fastvideo.configs.models.vaes.hunyuan15vae import (
            Hunyuan15VAEArchConfig, Hunyuan15VAEConfig)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = Hunyuan15VAEArchConfig(**TINY)
    cfg = Hunyuan15VAEConfig(arch_config=arch)
    torch.manual_seed(0)
    vae = mod.AutoencoderKLHYWorld(cfg)
    with torch.no_grad():
        for p in vae.parameters():
            torch.nn.init.normal_(p, std=0.1)
    vae.eval()
    return vae


def _build_jax(ref_vae):
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.loader.weight_utils import load_weights
    from fastvideo_tpu.models.vaes.hyworld import (
        HYWORLD_VAE_PARAM_NAMES_MAPPING, AutoencoderKLHYWorld,
        HYWorldVAEArchConfig)

    cfg = HYWorldVAEArchConfig(**TINY)
    vae = AutoencoderKLHYWorld(cfg, param_dtype=jnp.float32,
                               rngs=nnx.Rngs(0))
    sd = ref_vae.state_dict()
    n = load_weights(vae, ((k, v.detach().numpy()) for k, v in sd.items()),
                     HYWORLD_VAE_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"
    return vae


def test_hyworld_decode_parity(ref_vae):
    import jax.numpy as jnp
    import torch

    jax_vae = _build_jax(ref_vae)
    rng = np.random.default_rng(0)
    z = rng.standard_normal((1, 4, 3, 2, 2)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_vae._decode(torch.from_numpy(z)).numpy()
    out = np.asarray(jax_vae.decode(jnp.asarray(z)))
    assert ref_out.shape == out.shape, (ref_out.shape, out.shape)
    err = np.abs(ref_out - out).max()
    # the reference evaluates in 1+4k-frame cached chunks; measured: the
    # reference's OWN chunked path differs from its full-clip hy1.5 path
    # by 1.1e-3 (decode) / 4.6e-3 (encode) at these weights — our fused
    # full-clip program matches hy1.5 to 5e-4, so the bound here is the
    # chunking drift, not port error
    assert err < 6e-3, f"decode max err {err}"


def test_hyworld_encode_parity(ref_vae):
    import jax.numpy as jnp
    import torch

    jax_vae = _build_jax(ref_vae)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 9, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref_m = ref_vae._encode(torch.from_numpy(x)).numpy()
    m = np.asarray(jax_vae.encode(
        jnp.asarray(x)).parameters).transpose(0, 4, 1, 2, 3)
    assert ref_m.shape == m.shape, (ref_m.shape, m.shape)
    err = np.abs(ref_m - m).max()
    assert err < 6e-3, f"encode max err {err}"
