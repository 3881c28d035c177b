"""HY-World DiT parity vs the reference torch model (tiny, CPU)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

# reference HYWorldArchConfig uses HY-WorldPlay naming
REF_TINY = dict(in_channels=6, concat_condition=False, out_channels=4,
                hidden_size=48, heads_num=2, mlp_width_ratio=2.0,
                mm_double_blocks_depth=2, rope_dim_list=[8, 8, 8],
                text_states_dim=32, text_states_dim_2=24,
                vision_states_dim=20, rope_theta=256.0)
# ours uses the hy1.5 naming for the same architecture
MY_TINY = dict(in_channels=6, out_channels=4, num_attention_heads=2,
               attention_head_dim=24, num_layers=2, num_refiner_layers=2,
               mlp_ratio=2.0, patch_size=1, patch_size_t=1,
               rope_axes_dim=(8, 8, 8), text_embed_dim=32,
               text_embed_2_dim=24, image_embed_dim=20, rope_theta=256.0)


@pytest.fixture(scope="module")
def ref_model():
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    try:
        mod = ref_loader.import_ref("fastvideo.models.dits.hyworld")
        ref_loader.patch_cpu_sdpa()
        ref_loader.init_ref_distributed()
        from fastvideo.configs.models.dits.hyworld import (HYWorldArchConfig,
                                                           HYWorldConfig)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = HYWorldArchConfig(**REF_TINY)
    cfg = HYWorldConfig(arch_config=arch)
    torch.manual_seed(0)
    model = mod.HYWorldTransformer3DModel(cfg, {})
    with torch.no_grad():
        for p in model.parameters():
            torch.nn.init.normal_(p, std=0.04)
    model.eval()
    return model


@pytest.mark.parametrize("i2v", [True, False])
def test_hyworld_forward_parity(ref_model, i2v):
    import torch

    import jax.numpy as jnp
    from flax import nnx

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.configs.models.dits.hyworld import HYWorldArchConfig
    from fastvideo_tpu.models.dits.hyworld import HYWorldTransformer3DModel
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    cfg = HYWorldArchConfig(**MY_TINY)
    ours = HYWorldTransformer3DModel(cfg, param_dtype=jnp.float32,
                                     rngs=nnx.Rngs(0))
    sd = ref_model.state_dict()
    n = load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                     strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"

    rng = np.random.default_rng(0)
    T = 3
    x = rng.standard_normal((1, 6, T, 8, 8)).astype(np.float32)
    txt = rng.standard_normal((1, 9, 32)).astype(np.float32)
    txt2 = rng.standard_normal((1, 5, 24)).astype(np.float32)
    # per-frame timesteps + actions
    t = np.array([[700.0, 650.0, 600.0]], dtype=np.float32)
    t_txt = np.array([700.0], dtype=np.float32)
    action = np.array([[1.0, 2.0, 3.0]], dtype=np.float32)
    view = np.tile(np.eye(4, dtype=np.float32), (1, T, 1, 1))
    view[:, 1, :3, 3] = [0.1, -0.2, 0.3]
    view[:, 2, :3, 3] = [0.2, 0.1, -0.1]
    K = np.tile(np.eye(3, dtype=np.float32), (1, T, 1, 1))
    K[:, :, 0, 0] = 0.9
    K[:, :, 1, 1] = 1.1
    img_embeds = (rng.standard_normal(
        (1, 4, 20)).astype(np.float32) if i2v else np.zeros((1, 4, 20),
                                                            np.float32))
    mask = np.ones((1, 9), np.int64)
    mask2 = np.ones((1, 5), np.int64)

    from fastvideo.forward_context import set_forward_context

    with torch.no_grad(), set_forward_context(current_timestep=0,
                                              attn_metadata=None):
        ref_out = ref_model(
            torch.from_numpy(x),
            [torch.from_numpy(txt), torch.from_numpy(txt2)],
            torch.from_numpy(t.reshape(-1)),
            [torch.from_numpy(img_embeds)],
            [torch.from_numpy(mask), torch.from_numpy(mask2)],
            torch.from_numpy(action), torch.from_numpy(view),
            torch.from_numpy(K), torch.from_numpy(t_txt)).numpy()

    par.destroy_mesh()
    par.maybe_init_mesh(par.MeshConfig(dp_size=1, sp_size=1, tp_size=1))
    got = np.asarray(
        ours(jnp.asarray(x), (jnp.asarray(txt), jnp.asarray(txt2)),
             jnp.asarray(t),
             encoder_hidden_states_image=(jnp.asarray(img_embeds)
                                          if i2v else None),
             action=jnp.asarray(action), viewmats=jnp.asarray(view),
             Ks=jnp.asarray(K), timestep_txt=jnp.asarray(t_txt)))
    par.destroy_mesh()
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, atol=5e-4, rtol=5e-3)
