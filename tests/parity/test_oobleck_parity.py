"""Oobleck audio VAE parity vs the reference torch model (tiny, CPU)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

TINY = dict(encoder_hidden_size=8, downsampling_ratios=[2, 4],
            channel_multiples=[2, 4], decoder_channels=8,
            decoder_input_channels=4, audio_channels=2)


@pytest.fixture(scope="module")
def ref_model():
    try:
        mod = ref_loader.import_ref("fastvideo.models.vaes.oobleck")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    torch.manual_seed(0)
    model = mod.OobleckVAE(**TINY)
    with torch.no_grad():
        for p in model.parameters():
            torch.nn.init.normal_(p, std=0.3)
    model.eval()
    return model


def _build_ours(ref_model):
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.loader.weight_utils import load_weights
    from fastvideo_tpu.models.vaes.oobleck import (OobleckVAE,
                                                   OobleckVAEArchConfig)

    cfg = OobleckVAEArchConfig(
        encoder_hidden_size=TINY["encoder_hidden_size"],
        downsampling_ratios=tuple(TINY["downsampling_ratios"]),
        channel_multiples=tuple(TINY["channel_multiples"]),
        decoder_channels=TINY["decoder_channels"],
        decoder_input_channels=TINY["decoder_input_channels"],
        audio_channels=TINY["audio_channels"])
    ours = OobleckVAE(cfg, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    sd = ref_model.state_dict()
    n = load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                     strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"
    return ours


def test_oobleck_encode_decode_parity(ref_model):
    import torch

    import jax.numpy as jnp

    ours = _build_ours(ref_model)
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((1, 2, 64)).astype(np.float32) * 0.5

    with torch.no_grad():
        ref_post = ref_model.encode(torch.from_numpy(wav))
        ref_mean = ref_post.mean.numpy()
        ref_std = ref_post.std.numpy()
        ref_dec = ref_model.decode(
            torch.from_numpy(ref_mean)).sample.numpy()

    post = ours.encode(jnp.asarray(wav))
    np.testing.assert_allclose(np.asarray(post.mean), ref_mean, atol=2e-5,
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(post.std), ref_std, atol=2e-5,
                               rtol=2e-4)
    dec = np.asarray(ours.decode(jnp.asarray(ref_mean)))
    assert dec.shape == ref_dec.shape
    np.testing.assert_allclose(dec, ref_dec, atol=5e-5, rtol=5e-4)
