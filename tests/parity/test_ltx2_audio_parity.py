"""LTX-2 audio VAE + vocoder parity vs the reference torch models."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

VAE_KW = dict(ch=16, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=set(), in_channels=2, resolution=16,
              z_channels=4, mel_bins=8)


@pytest.fixture(scope="module")
def ref_mod():
    try:
        return ref_loader.import_ref("fastvideo.models.audio.ltx2_audio_vae")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")


def _load(ours, ref):
    import torch

    from fastvideo_tpu.models.audio.ltx2_audio_vae import (
        LTX2_AUDIO_PARAM_NAMES_MAPPING)
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    sd = {k: v for k, v in ref.state_dict().items() if "filter" not in k}
    n = load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                     LTX2_AUDIO_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"


def test_audio_encoder_decoder_parity(ref_mod):
    import torch

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.audio.ltx2_audio_vae import (
        AudioDecoder, AudioEncoder, LTX2AudioVAEArchConfig)

    NT = ref_mod.NormType
    CA = ref_mod.CausalityAxis
    torch.manual_seed(0)
    ref_enc = ref_mod.AudioEncoder(
        **VAE_KW, norm_type=NT.PIXEL, causality_axis=CA.HEIGHT)
    ref_dec = ref_mod.AudioDecoder(
        ch=16, out_ch=2, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=set(), resolution=16, z_channels=4,
        norm_type=NT.PIXEL, causality_axis=CA.HEIGHT, mel_bins=8)
    with torch.no_grad():
        for m in (ref_enc, ref_dec):
            for p in m.parameters():
                torch.nn.init.normal_(p, std=0.1)
            for name, b in m.named_buffers():
                if "std-of-means" in name:
                    b.copy_(torch.rand_like(b) + 0.5)
                elif "mean-of-means" in name:
                    torch.nn.init.normal_(b, std=0.1)
    ref_enc.eval()
    ref_dec.eval()

    cfg = LTX2AudioVAEArchConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1,
                                 attn_resolutions=(), in_channels=2,
                                 out_ch=2, resolution=16, z_channels=4,
                                 causality_axis="height", mel_bins=8)
    enc = AudioEncoder(cfg, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    dec = AudioDecoder(cfg, param_dtype=jnp.float32, rngs=nnx.Rngs(1))
    _load(enc, ref_enc)
    _load(dec, ref_dec)

    rng = np.random.default_rng(0)
    spec = rng.standard_normal((1, 2, 9, 8)).astype(np.float32)
    with torch.no_grad():
        ref_lat = ref_enc(torch.from_numpy(spec)).numpy()
    got_lat = np.asarray(enc(jnp.asarray(spec)))
    np.testing.assert_allclose(got_lat, ref_lat, atol=2e-5, rtol=2e-4)

    lat = rng.standard_normal(ref_lat.shape).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_dec(torch.from_numpy(lat)).numpy()
    got_out = np.asarray(dec(jnp.asarray(lat)))
    assert got_out.shape == ref_out.shape
    np.testing.assert_allclose(got_out, ref_out, atol=5e-5, rtol=5e-4)


@pytest.mark.parametrize("resblock", ["1", "AMP1"])
def test_vocoder_parity(ref_mod, resblock):
    import torch

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.audio.ltx2_audio_vae import (Vocoder,
                                                           VocoderArchConfig)

    torch.manual_seed(0)
    kw = dict(resblock_kernel_sizes=[3], upsample_rates=[2, 2],
              upsample_kernel_sizes=[4, 4],
              resblock_dilation_sizes=[[1, 3, 5]],
              upsample_initial_channel=16, stereo=True, resblock=resblock,
              activation="snake")
    ref = ref_mod.Vocoder(**kw)
    with torch.no_grad():
        for p in ref.parameters():
            torch.nn.init.normal_(p, std=0.1)
    ref.eval()

    cfg = VocoderArchConfig(resblock_kernel_sizes=(3,),
                            upsample_rates=(2, 2),
                            upsample_kernel_sizes=(4, 4),
                            resblock_dilation_sizes=((1, 3, 5),),
                            upsample_initial_channel=16, stereo=True,
                            resblock=resblock, activation="snake")
    ours = Vocoder(cfg, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    _load(ours, ref)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 2, 5, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(mel)).numpy()
    got = np.asarray(ours(jnp.asarray(mel)))
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, atol=1e-4, rtol=1e-3)
