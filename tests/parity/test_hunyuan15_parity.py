"""HunyuanVideo-1.5 DiT parity vs the reference torch model (tiny, CPU)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

TINY = dict(attention_head_dim=24, num_attention_heads=4, num_layers=2,
            num_refiner_layers=1, mlp_ratio=2.0, in_channels=6,
            out_channels=4, patch_size=1, patch_size_t=1,
            rope_axes_dim=(8, 8, 8), text_embed_dim=32, text_embed_2_dim=24,
            image_embed_dim=20, rope_theta=256)


@pytest.fixture(scope="module")
def ref_model():
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    try:
        mod = ref_loader.import_ref("fastvideo.models.dits.hunyuanvideo15")
        ref_loader.patch_cpu_sdpa()
        ref_loader.init_ref_distributed()
        from fastvideo.configs.models.dits.hunyuanvideo15 import (
            HunyuanVideo15ArchConfig, HunyuanVideo15Config)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = HunyuanVideo15ArchConfig(**TINY)
    cfg = HunyuanVideo15Config(arch_config=arch)
    torch.manual_seed(0)
    model = mod.HunyuanVideo15Transformer3DModel(cfg, {})
    with torch.no_grad():
        for p in model.parameters():
            torch.nn.init.normal_(p, std=0.04)
    model.eval()
    return model


def _build_ours(ref_model):
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.hunyuan15 import (
        HunyuanVideo15ArchConfig)
    from fastvideo_tpu.models.dits.hunyuan15 import (
        HunyuanVideo15Transformer3DModel)
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    cfg = HunyuanVideo15ArchConfig(**TINY)
    ours = HunyuanVideo15Transformer3DModel(cfg, param_dtype=jnp.float32,
                                            rngs=nnx.Rngs(0))
    sd = ref_model.state_dict()
    n = load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                     strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"
    return ours


@pytest.mark.parametrize("i2v", [False, True])
def test_hunyuan15_forward_parity(ref_model, i2v):
    import torch

    import jax.numpy as jnp

    import fastvideo_tpu.parallel as par

    ours = _build_ours(ref_model)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 6, 3, 8, 8)).astype(np.float32)
    txt = rng.standard_normal((1, 9, 32)).astype(np.float32)
    txt2 = rng.standard_normal((1, 5, 24)).astype(np.float32)
    t = np.array([700.0], dtype=np.float32)
    img_embeds = (rng.standard_normal(
        (1, 4, 20)).astype(np.float32) if i2v else np.zeros(
            (1, 4, 20), np.float32))

    from fastvideo.forward_context import set_forward_context

    with torch.no_grad(), set_forward_context(current_timestep=0,
                                              attn_metadata=None):
        ref_out = ref_model(
            torch.from_numpy(x),
            [torch.from_numpy(txt), torch.from_numpy(txt2)],
            torch.from_numpy(t),
            [torch.from_numpy(img_embeds)]).numpy()

    par.destroy_mesh()
    par.maybe_init_mesh(par.MeshConfig(dp_size=1, sp_size=1, tp_size=1))
    out = np.asarray(
        ours(jnp.asarray(x), (jnp.asarray(txt), jnp.asarray(txt2)),
             jnp.asarray(t),
             encoder_hidden_states_image=(jnp.asarray(img_embeds)
                                          if i2v else None)))
    par.destroy_mesh()
    assert ref_out.shape == out.shape
    err = np.abs(ref_out - out).max()
    scale = np.abs(ref_out).max()
    assert err / scale < 3e-4, (err, scale)
