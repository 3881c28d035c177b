"""SD3.5 MM-DiT parity: JAX vs reference torch (identical tiny weights)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

TINY = dict(sample_size=16, patch_size=2, in_channels=4, out_channels=4,
            num_layers=3, attention_head_dim=8, num_attention_heads=2,
            joint_attention_dim=32, caption_projection_dim=16,
            pooled_projection_dim=24, pos_embed_max_size=16,
            qk_norm="rms_norm", dual_attention_layers=[0])


@pytest.fixture(scope="module")
def ref_model():
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    try:
        ref_loader.init_ref_distributed()
        mod = ref_loader.import_ref("fastvideo.models.dits.sd3")
        from fastvideo.configs.models.dits.sd3 import (
            SD3DiTConfig, SD3Transformer2DArchConfig)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = SD3Transformer2DArchConfig(**{
        k: (list(v) if isinstance(v, list) else v) for k, v in TINY.items()})
    cfg = SD3DiTConfig(arch_config=arch)
    torch.manual_seed(0)
    ref_loader.patch_cpu_sdpa()
    model = mod.SD3Transformer2DModel(cfg, hf_config=dict(TINY))
    with torch.no_grad():
        for p in model.parameters():
            torch.nn.init.normal_(p, std=0.08)
    model.eval()
    return model


def test_sd3_forward_parity(ref_model):
    import torch

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.dits.sd3 import (SD3_PARAM_NAMES_MAPPING,
                                               SD3ArchConfig,
                                               SD3Transformer2DModel)
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    cfg = SD3ArchConfig(**{
        k: (tuple(v) if isinstance(v, list) else v) for k, v in TINY.items()})
    ours = SD3Transformer2DModel(cfg, param_dtype=jnp.float32,
                                 rngs=nnx.Rngs(0))
    sd = ref_model.state_dict()
    n = load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                     SD3_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((1, 6, 32)).astype(np.float32)
    pooled = rng.standard_normal((1, 24)).astype(np.float32)
    t = np.array([500.0], dtype=np.float32)

    with torch.no_grad():
        ref_out = ref_model(
            hidden_states=torch.from_numpy(x),
            encoder_hidden_states=torch.from_numpy(ctx),
            pooled_projections=torch.from_numpy(pooled),
            timestep=torch.from_numpy(t),
            return_dict=False)[0].numpy()

    jax_out = np.asarray(
        ours(jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(t),
             pooled_projections=jnp.asarray(pooled)))
    assert ref_out.shape == jax_out.shape, (ref_out.shape, jax_out.shape)
    err = np.abs(ref_out - jax_out).max()
    assert err < 3e-4, f"forward max err {err}"
