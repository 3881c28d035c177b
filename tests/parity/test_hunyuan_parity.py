"""HunyuanVideo DiT parity vs the reference torch model (tiny, CPU)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

TINY = dict(attention_head_dim=24, num_attention_heads=4, num_layers=2,
            num_single_layers=2, num_refiner_layers=1, mlp_ratio=2.0,
            in_channels=4, out_channels=4, patch_size=2, patch_size_t=1,
            rope_axes_dim=(8, 8, 8), guidance_embeds=True,
            text_embed_dim=32, pooled_projection_dim=16, rope_theta=256)


@pytest.fixture(scope="module")
def ref_model():
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    try:
        mod = ref_loader.import_ref("fastvideo.models.dits.hunyuanvideo")
        ref_loader.patch_cpu_sdpa()
        ref_loader.init_ref_distributed()
        from fastvideo.configs.models.dits.hunyuanvideo import (
            HunyuanVideoArchConfig, HunyuanVideoConfig)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = HunyuanVideoArchConfig(**TINY)
    cfg = HunyuanVideoConfig(arch_config=arch)
    torch.manual_seed(0)
    model = mod.HunyuanVideoTransformer3DModel(cfg, {})
    with torch.no_grad():
        for p in model.parameters():
            torch.nn.init.normal_(p, std=0.04)
    model.eval()
    return model


def test_hunyuan_forward_parity(ref_model):
    import torch

    import jax.numpy as jnp
    from flax import nnx

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.configs.models.dits.hunyuan import (
        HunyuanVideoArchConfig)
    from fastvideo_tpu.models.dits.hunyuan import (
        HunyuanVideoTransformer3DModel)
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    cfg = HunyuanVideoArchConfig(**TINY)
    ours = HunyuanVideoTransformer3DModel(cfg, param_dtype=jnp.float32,
                                          rngs=nnx.Rngs(0))
    sd = ref_model.state_dict()
    n = load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                     strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 3, 8, 8)).astype(np.float32)
    # token 0 carries the pooled projection (reference forward :556-561)
    txt_full = rng.standard_normal((1, 9, 32)).astype(np.float32)
    t = np.array([700.0], dtype=np.float32)
    guidance = np.array([6016.0], dtype=np.float32)

    from fastvideo.forward_context import set_forward_context

    with torch.no_grad(), set_forward_context(current_timestep=0,
                                              attn_metadata=None):
        ref_out = ref_model(torch.from_numpy(x), torch.from_numpy(txt_full),
                            torch.from_numpy(t),
                            guidance=torch.from_numpy(guidance)).numpy()

    par.destroy_mesh()
    par.maybe_init_mesh(par.MeshConfig(dp_size=1, sp_size=1, tp_size=1))
    out = np.asarray(
        ours(jnp.asarray(x), jnp.asarray(txt_full), jnp.asarray(t),
             guidance=jnp.asarray(guidance)))
    assert ref_out.shape == out.shape
    err = np.abs(ref_out - out).max()
    scale = np.abs(ref_out).max()
    assert err / scale < 3e-4, (err, scale)
