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


def test_int8_conv_decode_tracks_bf16(monkeypatch):
    """Full VAE decode with FASTVIDEO_VAE_CONV3D=kf_int8 stays close to the
    default path (the accuracy gate behind the int8 decode-serving lever;
    per-tensor activation + per-channel weight int8 through the decoder's
    96-ch residual convs)."""
    import jax

    from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig
    from fastvideo_tpu.eval.metrics import ssim
    from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan

    vae = AutoencoderKLWan(WanVAEArchConfig(), load_encoder=False,
                           param_dtype=jnp.float32, rngs=nnx.Rngs(2))
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 1, 4, 4),
                          jnp.float32) * 0.5
    monkeypatch.delenv("FASTVIDEO_VAE_CONV3D", raising=False)
    ref = np.asarray(vae.decode(z), np.float32)
    monkeypatch.setenv("FASTVIDEO_VAE_CONV3D", "kf_int8")
    out = np.asarray(vae.decode(z), np.float32)
    assert out.shape == ref.shape

    def thwc(v):  # [B, C, T, H, W] -> [T, H, W, C] in [0, 1]
        return (np.clip(v[0].transpose(1, 2, 3, 0), -1, 1) + 1) / 2

    s = ssim(thwc(out), thwc(ref))
    assert s >= 0.92, f"int8 conv decode SSIM vs bf16 below bar: {s:.4f}"
