"""FLUX.1 transformer parity: JAX vs reference torch (tiny weights)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

TINY = dict(patch_size=1, in_channels=16, num_layers=2, num_single_layers=2,
            attention_head_dim=8, num_attention_heads=2,
            joint_attention_dim=32, pooled_projection_dim=24,
            guidance_embeds=True, axes_dims_rope=[4, 2, 2])


@pytest.fixture(scope="module")
def ref_model():
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    try:
        ref_loader.init_ref_distributed()
        mod = ref_loader.import_ref("fastvideo.models.dits.flux")
        ref_loader.patch_cpu_sdpa()
        from fastvideo.configs.models.dits.flux import (
            FluxDiTConfig, FluxTransformer2DArchConfig)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = FluxTransformer2DArchConfig(**{
        k: (tuple(v) if isinstance(v, list) else v) for k, v in TINY.items()})
    cfg = FluxDiTConfig(arch_config=arch)
    torch.manual_seed(0)
    model = mod.FluxTransformer2DModel(cfg, hf_config=dict(TINY))
    with torch.no_grad():
        for p in model.parameters():
            torch.nn.init.normal_(p, std=0.08)
    model.eval()
    return model


def test_flux_forward_parity(ref_model):
    import torch

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.dits.flux import (FLUX_PARAM_NAMES_MAPPING,
                                                FluxArchConfig,
                                                FluxTransformer2DModel)
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    cfg = FluxArchConfig(**{
        k: (tuple(v) if isinstance(v, list) else v) for k, v in TINY.items()})
    ours = FluxTransformer2DModel(cfg, param_dtype=jnp.float32,
                                  rngs=nnx.Rngs(0))
    sd = ref_model.state_dict()
    n = load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                     FLUX_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"

    rng = np.random.default_rng(0)
    h_p, w_p = 4, 4  # packed token grid
    x = rng.standard_normal((1, h_p * w_p, 16)).astype(np.float32)
    ctx = rng.standard_normal((1, 6, 32)).astype(np.float32)
    pooled = rng.standard_normal((1, 24)).astype(np.float32)
    t = np.array([0.5], dtype=np.float32)
    guidance = np.array([3.5], dtype=np.float32)
    img_ids = np.zeros((h_p * w_p, 3), dtype=np.float32)
    img_ids[:, 1] = np.repeat(np.arange(h_p), w_p)
    img_ids[:, 2] = np.tile(np.arange(w_p), h_p)
    txt_ids = np.zeros((6, 3), dtype=np.float32)

    with torch.no_grad():
        ref_out = ref_model(
            hidden_states=torch.from_numpy(x),
            encoder_hidden_states=torch.from_numpy(ctx),
            pooled_projections=torch.from_numpy(pooled),
            timestep=torch.from_numpy(t),
            guidance=torch.from_numpy(guidance),
            img_ids=torch.from_numpy(img_ids),
            txt_ids=torch.from_numpy(txt_ids),
            return_dict=False)[0].numpy()

    jax_out = np.asarray(
        ours(jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(t),
             pooled_projections=jnp.asarray(pooled),
             img_ids=jnp.asarray(img_ids),
             guidance=jnp.asarray(guidance)))
    assert ref_out.shape == jax_out.shape, (ref_out.shape, jax_out.shape)
    err = np.abs(ref_out - jax_out).max()
    assert err < 3e-4, f"forward max err {err}"
