"""CausalConv3d: Pallas conv3d path (FASTVIDEO_VAE_CONV3D) matches the
temporal-tap decomposition."""

import jax.numpy as jnp
import numpy as np
from flax import nnx


def test_pallas_path_matches_taps(monkeypatch):
    from fastvideo_tpu.models.vaes.wan import CausalConv3d

    conv = CausalConv3d(8, 16, 3, padding=1, param_dtype=jnp.float32,
                        rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 4, 8, 16, 8)), jnp.float32)
    ref = conv(x)
    monkeypatch.setenv("FASTVIDEO_VAE_CONV3D", "dma")
    out = conv(x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
    # unsupported shapes fall back to the taps path (stride-2 conv)
    down = CausalConv3d(8, 8, 3, stride=(1, 2, 2), padding=1,
                        param_dtype=jnp.float32, rngs=nnx.Rngs(1))
    ref2 = None
    monkeypatch.delenv("FASTVIDEO_VAE_CONV3D")
    ref2 = down(x)
    monkeypatch.setenv("FASTVIDEO_VAE_CONV3D", "dma")
    out2 = down(x)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=2e-3, rtol=2e-3)
