"""LTX-2 video VAE parity vs the reference torch implementation.

Tiny block lists, identical random weights, encode + timestep-conditioned
decode (deterministic: zero decode noise injected on both sides).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

TINY_CFG = {
    "dims": 3,
    "in_channels": 3,
    "out_channels": 3,
    "latent_channels": 8,
    "patch_size": 2,
    "encoder_blocks": [
        ["res_x", {"num_layers": 1}],
        ["compress_all_res", {"multiplier": 2}],
        ["res_x", {"num_layers": 1}],
    ],
    "decoder_blocks": [
        ["res_x", {"num_layers": 1, "inject_noise": False}],
        ["compress_all", {"residual": True, "multiplier": 2}],
        ["res_x", {"num_layers": 1, "inject_noise": False}],
    ],
    "norm_layer": "pixel_norm",
    "latent_log_var": "uniform",
    "causal_decoder": False,
    "timestep_conditioning": True,
    "encoder_spatial_padding_mode": "zeros",
    "decoder_spatial_padding_mode": "reflect",
}


@pytest.fixture(scope="module")
def ref_vae():
    try:
        mod = ref_loader.import_ref("fastvideo.models.vaes.ltx2vae")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    torch.manual_seed(0)
    vae = mod.LTX2CausalVideoAutoencoder(TINY_CFG)
    with torch.no_grad():
        for p in vae.parameters():
            torch.nn.init.normal_(p, std=0.1)
    vae.eval()
    vae.disable_channels_last_3d()
    return vae


def _build_jax(ref_vae):
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.loader.weight_utils import load_weights
    from fastvideo_tpu.models.vaes.ltx2 import (LTX2_VAE_PARAM_NAMES_MAPPING,
                                                LTX2CausalVideoAutoencoder,
                                                LTX2VAEArchConfig)

    cfg = LTX2VAEArchConfig(
        latent_channels=8, patch_size=2,
        encoder_blocks=tuple((n, dict(p))
                             for n, p in TINY_CFG["encoder_blocks"]),
        decoder_blocks=tuple((n, dict(p))
                             for n, p in TINY_CFG["decoder_blocks"]),
        causal_decoder=False, timestep_conditioning=True)
    vae = LTX2CausalVideoAutoencoder(cfg, param_dtype=jnp.float32,
                                     rngs=nnx.Rngs(0))
    sd = ref_vae.state_dict()
    n = load_weights(vae, ((k, v.detach().numpy())
                           for k, v in sd.items()),
                     LTX2_VAE_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"
    return vae


def test_ltx2vae_encode_parity(ref_vae):
    import jax.numpy as jnp
    import torch

    jax_vae = _build_jax(ref_vae)
    rng = np.random.default_rng(0)
    # the reference encoder asserts 1 + 8x input frames
    x = rng.standard_normal((1, 3, 9, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_lat = ref_vae.encoder(torch.from_numpy(x)).numpy()

    got = jax_vae.encoder(jnp.asarray(x))
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)  # NDHWC -> NCDHW
    assert got.shape == ref_lat.shape
    err = np.abs(got - ref_lat).max()
    scale = np.abs(ref_lat).max()
    assert err / scale < 2e-4, f"encode max rel err {err / scale}"


def test_ltx2vae_decode_parity(ref_vae):
    import jax.numpy as jnp
    import torch

    jax_vae = _build_jax(ref_vae)
    rng = np.random.default_rng(1)
    z = rng.standard_normal((1, 8, 2, 4, 4)).astype(np.float32)
    noise = np.zeros_like(z)

    class _ZeroGen:
        pass

    with torch.no_grad():
        # deterministic: monkeypatch torch.randn noise to zeros by seeding
        # and replacing - simpler: call decoder with noise pre-applied
        dec = ref_vae.decoder
        sample = torch.from_numpy(z)
        sample = 0.0 + (1.0 - dec.decode_noise_scale) * sample
        ts = torch.full((1,), dec.decode_timestep)
        # run the reference decoder body minus its noise injection
        s = dec.per_channel_statistics.un_normalize(sample)
        s = dec.conv_in(s, causal=dec.causal)
        scaled_t = ts * dec.timestep_scale_multiplier
        for blk in dec.up_blocks:
            import fastvideo.models.vaes.ltx2vae as mod

            if isinstance(blk, mod.UNetMidBlock3D):
                s = blk(s, causal=dec.causal, timestep=scaled_t)
            elif isinstance(blk, mod.ResnetBlock3D):
                s = blk(s, causal=dec.causal)
            else:
                s = blk(s, causal=dec.causal)
        s = dec.conv_norm_out(s)
        emb = dec.last_time_embedder(timestep=scaled_t.flatten(),
                                     hidden_dtype=s.dtype)
        emb = emb.view(1, emb.shape[-1], 1, 1, 1)
        ada = dec.last_scale_shift_table[None, ..., None, None, None] + \
            emb.reshape(1, 2, -1, 1, 1, 1)
        shift, scale = ada.unbind(dim=1)
        s = s * (1 + scale) + shift
        s = dec.conv_act(s)
        s = dec.conv_out(s, causal=dec.causal)
        ref_px = mod.unpatchify(s, patch_size_hw=dec.patch_size,
                                patch_size_t=1).numpy()

    got = np.asarray(
        jax_vae.decode(jnp.asarray(z), noise=jnp.zeros(
            (1, 2, 4, 4, 8), jnp.float32)))
    assert got.shape == ref_px.shape
    err = np.abs(got - ref_px).max()
    scale = np.abs(ref_px).max()
    assert err / scale < 2e-4, f"decode max rel err {err / scale}"
