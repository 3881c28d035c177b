"""HunyuanVideo-1.5 SR upsampler parity vs the reference torch modules."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402


@pytest.fixture(scope="module")
def ref_mod():
    try:
        mod = ref_loader.import_ref("fastvideo.models.upsamplers.hunyuan15")
        from fastvideo.configs.models.upsamplers import (
            SRTo720pUpsamplerConfig, SRTo1080pUpsamplerConfig)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    return mod


def test_720p_upsampler_parity(ref_mod):
    import torch

    from fastvideo.configs.models.upsamplers import SRTo720pUpsamplerConfig

    cfg_kw = dict(in_channels=4, out_channels=4, hidden_channels=8,
                  num_blocks=2, global_residual=True)
    torch.manual_seed(0)
    ref = ref_mod.SRTo720pUpsampler(SRTo720pUpsamplerConfig(**cfg_kw))
    with torch.no_grad():
        for p in ref.parameters():
            torch.nn.init.normal_(p, std=0.1)
    ref.eval()

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.loader.weight_utils import load_weights
    from fastvideo_tpu.models.upsamplers.hunyuan15 import (
        HY15_UPSAMPLER_PARAM_NAMES_MAPPING, SRTo720pUpsampler,
        SRTo720pUpsamplerConfig as JCfg)

    model = SRTo720pUpsampler(JCfg(**cfg_kw), param_dtype=jnp.float32,
                              rngs=nnx.Rngs(0))
    sd = ref.state_dict()
    n = load_weights(model, ((k, v.numpy()) for k, v in sd.items()),
                     HY15_UPSAMPLER_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 3, 6, 6)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(model(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref_out, atol=2e-5, rtol=2e-4)


def test_1080p_upsampler_parity(ref_mod):
    import torch

    from fastvideo.configs.models.upsamplers import SRTo1080pUpsamplerConfig

    cfg_kw = dict(z_channels=4, out_channels=4, block_out_channels=(8, 8),
                  num_res_blocks=1, is_residual=False)
    torch.manual_seed(1)
    ref = ref_mod.SRTo1080pUpsampler(SRTo1080pUpsamplerConfig(**cfg_kw))
    with torch.no_grad():
        for p in ref.parameters():
            torch.nn.init.normal_(p, std=0.1)
    ref.eval()

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.loader.weight_utils import load_weights
    from fastvideo_tpu.models.upsamplers.hunyuan15 import (
        HY15_UPSAMPLER_PARAM_NAMES_MAPPING, SRTo1080pUpsampler,
        SRTo1080pUpsamplerConfig as JCfg)

    model = SRTo1080pUpsampler(JCfg(**cfg_kw), param_dtype=jnp.float32,
                               rngs=nnx.Rngs(0))
    sd = ref.state_dict()
    n = load_weights(model, ((k, v.numpy()) for k, v in sd.items()),
                     HY15_UPSAMPLER_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd)

    rng = np.random.default_rng(1)
    z = rng.standard_normal((1, 4, 2, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(z), target_shape=(6, 6)).numpy()
    got = np.asarray(model(jnp.asarray(z), target_shape=(6, 6)))
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, atol=3e-5, rtol=3e-4)
