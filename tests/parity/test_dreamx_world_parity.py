"""DreamX-World DiT parity vs the reference torch model (tiny, CPU)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

TINY = dict(num_attention_heads=2, attention_head_dim=24, in_channels=4,
            out_channels=4, text_dim=32, freq_dim=32, ffn_dim=64,
            num_layers=2, patch_size=(1, 2, 2),
            qk_norm="rms_norm_across_heads", cross_attn_norm=True, eps=1e-6,
            attn_compress=2)


@pytest.fixture(scope="module")
def ref_model():
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    try:
        mod = ref_loader.import_ref("fastvideo.models.dits.dreamx_world")
        ref_loader.patch_cpu_sdpa()
        ref_loader.init_ref_distributed()
        from fastvideo.configs.models.dits.dreamx_world import (
            DreamXWorldArchConfig, DreamXWorldConfig)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = DreamXWorldArchConfig(**TINY)
    cfg = DreamXWorldConfig(arch_config=arch)
    torch.manual_seed(0)
    model = mod.DreamXWorldTransformer3DModel(cfg, {})
    with torch.no_grad():
        for p in model.parameters():
            torch.nn.init.normal_(p, std=0.04)
    model.eval()
    return model


@pytest.mark.parametrize("with_camera", [True, False])
def test_dreamx_forward_parity(ref_model, with_camera):
    import torch

    import jax.numpy as jnp
    from flax import nnx

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.configs.models.dits.dreamx_world import (
        DreamXWorldArchConfig)
    from fastvideo_tpu.models.dits.dreamx_world import (
        DreamXWorldTransformer3DModel)
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    cfg = DreamXWorldArchConfig(**TINY)
    ours = DreamXWorldTransformer3DModel(cfg, param_dtype=jnp.float32,
                                         rngs=nnx.Rngs(0))
    sd = ref_model.state_dict()
    n = load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                     strict=True)
    assert n > 0

    rng = np.random.default_rng(0)
    # 2 latent frames = 2 cameras; 4x4 spatial
    x = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)
    txt = rng.standard_normal((1, 7, 32)).astype(np.float32)
    t = np.array([600.0], dtype=np.float32)
    y_camera = None
    if with_camera:
        view = np.tile(np.eye(4, dtype=np.float32), (1, 2, 1, 1))
        view[:, 1, :3, 3] = [0.1, -0.2, 0.3]
        K = np.tile(np.eye(3, dtype=np.float32), (1, 2, 1, 1))
        K[:, :, 0, 0] = 0.8
        K[:, :, 1, 1] = 1.2
        y_camera = {"viewmats": view, "K": K}

    from fastvideo.forward_context import set_forward_context

    with torch.no_grad(), set_forward_context(current_timestep=0,
                                              attn_metadata=None):
        kwargs = {}
        if y_camera is not None:
            kwargs["y_camera"] = {
                k: torch.from_numpy(v) for k, v in y_camera.items()
            }
        ref_out = ref_model(torch.from_numpy(x), torch.from_numpy(txt),
                            torch.from_numpy(t), **kwargs).numpy()

    par.destroy_mesh()
    par.maybe_init_mesh(par.MeshConfig(dp_size=1, sp_size=1, tp_size=1))
    jkw = {}
    if y_camera is not None:
        jkw["y_camera"] = {k: jnp.asarray(v) for k, v in y_camera.items()}
    got = np.asarray(
        ours(jnp.asarray(x), jnp.asarray(txt), jnp.asarray(t), **jkw))
    par.destroy_mesh()
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, atol=3e-4, rtol=3e-3)
