"""Numerical parity: fastvideo_tpu Wan DiT vs the reference torch model.

Golden-gate analog (/root/reference/fastvideo/tests/golden_gate/): identical
tiny random weights, fixed inputs, compare outputs. CPU-only (torch CPU +
JAX CPU). Run with: pytest tests/parity -q
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402


@pytest.fixture(scope="module")
def ref_env():
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    try:
        mod = ref_loader.import_ref("fastvideo.models.dits.wanvideo")
        ref_loader.patch_cpu_sdpa()
        ref_loader.init_ref_distributed()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    return mod


TINY = dict(num_attention_heads=4, attention_head_dim=24, in_channels=4,
            out_channels=4, text_dim=32, freq_dim=32, ffn_dim=64, num_layers=2)


def _build_ref_model(mod):
    from fastvideo.configs.models.dits.wanvideo import (WanVideoArchConfig,
                                                        WanVideoConfig)

    arch = WanVideoArchConfig(**TINY)
    cfg = WanVideoConfig(arch_config=arch)
    import torch

    torch.manual_seed(0)
    model = mod.WanTransformer3DModel(cfg, {})
    # The reference's vLLM-style linears allocate uninitialized weights
    # (filled by the checkpoint loader in production) — randomize them all.
    with torch.no_grad():
        for p in model.parameters():
            torch.nn.init.normal_(p, std=0.05)
    return model


def _build_tpu_model():
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel

    cfg = WanArchConfig(**TINY)
    return WanTransformer3DModel(cfg, param_dtype=jnp.float32,
                                 rngs=nnx.Rngs(0))


def test_wan_dit_forward_parity(ref_env):
    import torch

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    ref_model = _build_ref_model(ref_env)
    tpu_model = _build_tpu_model()

    sd = ref_model.state_dict()
    n = load_weights(tpu_model,
                     ((k, v.detach().numpy()) for k, v in sd.items()),
                     strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)} params"

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 4, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((1, 16, 32)).astype(np.float32)
    ts = np.array([500.0], dtype=np.float32)

    from fastvideo.forward_context import set_forward_context

    with torch.no_grad(), set_forward_context(current_timestep=0,
                                              attn_metadata=None):
        ref_out = ref_model(torch.from_numpy(x), torch.from_numpy(ctx),
                            torch.from_numpy(ts)).numpy()

    import jax
    import jax.numpy as jnp

    mesh = par.maybe_init_mesh(
        par.MeshConfig(dp_size=1, sp_size=1, tp_size=1))
    with par.mesh.mesh_context(mesh):
        tpu_out = np.asarray(
            tpu_model(jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(ts)))

    assert ref_out.shape == tpu_out.shape
    err = np.abs(ref_out - tpu_out).max()
    scale = np.abs(ref_out).max()
    assert err / scale < 2e-4, f"max rel err {err / scale} (abs {err})"
