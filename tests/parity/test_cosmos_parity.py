"""Cosmos video DiT parity: JAX vs reference torch (tiny weights)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

TINY = dict(in_channels=5, out_channels=4, num_attention_heads=2,
            attention_head_dim=12, num_layers=2, mlp_ratio=2.0,
            text_embed_dim=16, adaln_lora_dim=8, max_size=(16, 16, 16),
            patch_size=(1, 2, 2), rope_scale=(1.0, 3.0, 3.0),
            concat_padding_mask=False, extra_pos_embed_type="learnable")


@pytest.fixture(scope="module")
def ref_model():
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    try:
        ref_loader.init_ref_distributed()
        mod = ref_loader.import_ref("fastvideo.models.dits.cosmos")
        ref_loader.patch_cpu_sdpa()
        from fastvideo.configs.models.dits.cosmos import (CosmosArchConfig,
                                                          CosmosVideoConfig)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = CosmosArchConfig(**TINY)
    cfg = CosmosVideoConfig(arch_config=arch)
    torch.manual_seed(0)
    model = mod.CosmosTransformer3DModel(cfg, hf_config=dict(TINY))
    with torch.no_grad():
        for p in model.parameters():
            torch.nn.init.normal_(p, std=0.08)
    model.eval()
    return model


def test_cosmos_forward_parity(ref_model):
    import torch

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.dits.cosmos import (COSMOS_PARAM_NAMES_MAPPING,
                                                  CosmosArchConfig,
                                                  CosmosTransformer3DModel)
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    cfg = CosmosArchConfig(**TINY)
    ours = CosmosTransformer3DModel(cfg, param_dtype=jnp.float32,
                                    rngs=nnx.Rngs(0))
    sd = ref_model.state_dict()
    n = load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                     COSMOS_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 3, 8, 8)).astype(np.float32)
    cond_mask = np.zeros((1, 1, 3, 8, 8), np.float32)
    ctx = rng.standard_normal((1, 6, 16)).astype(np.float32)
    t = np.array([700.0], dtype=np.float32)

    with torch.no_grad():
        ref_out = ref_model(
            hidden_states=torch.from_numpy(x),
            timestep=torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(ctx),
            condition_mask=torch.from_numpy(cond_mask),
            padding_mask=None,
            return_dict=False)[0].numpy()

    jax_out = np.asarray(
        ours(jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(t),
             condition_mask=jnp.asarray(cond_mask)))
    assert ref_out.shape == jax_out.shape, (ref_out.shape, jax_out.shape)
    err = np.abs(ref_out - jax_out).max()
    assert err < 3e-4, f"forward max err {err}"
