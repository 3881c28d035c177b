"""Z-Image DiT parity vs the reference torch model (tiny, CPU)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

TINY = dict(all_patch_size=(2,), all_f_patch_size=(1,), in_channels=4,
            dim=48, n_layers=2, n_refiner_layers=1, n_heads=2,
            n_kv_heads=2, cap_feat_dim=24, rope_theta=256.0,
            axes_dims=(8, 8, 8), axes_lens=(64, 32, 32),
            adaln_embed_dim=32, frequency_embedding_size=16,
            timestep_mid_size=32, seq_multi_of=4)


@pytest.fixture(scope="module")
def ref_model():
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    try:
        mod = ref_loader.import_ref("fastvideo.models.dits.zimage")
        ref_loader.patch_cpu_sdpa()
        ref_loader.init_ref_distributed()
        from fastvideo.configs.models.dits.zimage import (ZImageDiTArchConfig,
                                                          ZImageDiTConfig)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = ZImageDiTArchConfig(**TINY)
    cfg = ZImageDiTConfig(arch_config=arch)
    torch.manual_seed(0)
    model = mod.ZImageTransformer2DModel(cfg, {})
    with torch.no_grad():
        for p in model.parameters():
            torch.nn.init.normal_(p, std=0.04)
    model.eval()
    return model


def _build_ours(ref_model):
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.zimage import (
        ZIMAGE_PARAM_NAMES_MAPPING, ZImageArchConfig)
    from fastvideo_tpu.models.dits.zimage import ZImageTransformer2DModel
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    cfg = ZImageArchConfig(**TINY)
    ours = ZImageTransformer2DModel(cfg, param_dtype=jnp.float32,
                                    rngs=nnx.Rngs(0))
    sd = ref_model.state_dict()
    n = load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                     ZIMAGE_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"
    return ours


@pytest.mark.parametrize("cap_len", [7, 8])
def test_zimage_forward_parity(ref_model, cap_len):
    """cap_len=7 exercises the seq_multi_of pad-token path; 8 is exact."""
    import torch

    import jax.numpy as jnp

    ours = _build_ours(ref_model)
    rng = np.random.default_rng(0)
    # latent [4, 1, 8, 8] -> 16 tokens (multiple of 4: no image padding)
    x = rng.standard_normal((1, 4, 1, 8, 8)).astype(np.float32)
    cap = rng.standard_normal((1, cap_len, 24)).astype(np.float32)
    t = np.array([0.35], dtype=np.float32)

    from fastvideo.forward_context import set_forward_context

    with torch.no_grad(), set_forward_context(current_timestep=0,
                                              attn_metadata=None):
        ref_out = ref_model(
            torch.from_numpy(x), torch.from_numpy(cap),
            torch.from_numpy(t))[0]
        ref_out = ref_out[0].unsqueeze(0).numpy()

    got = np.asarray(
        ours(jnp.asarray(x), jnp.asarray(cap), jnp.asarray(t)))
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, atol=3e-4, rtol=3e-3)
