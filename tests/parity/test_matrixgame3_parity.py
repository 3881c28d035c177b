"""Matrix-Game 3 DiT parity vs the reference torch model (tiny, CPU)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

ACTION = {
    "blocks": [0],
    "enable_mouse": True,
    "enable_keyboard": True,
    "heads_num": 2,
    "hidden_size": 8,
    "img_hidden_size": 48,
    "keyboard_dim_in": 6,
    "keyboard_hidden_dim": 128,
    "mouse_dim_in": 2,
    "mouse_hidden_dim": 128,
    "mouse_qk_dim_list": [32, 16, 16],
    "patch_size": [1, 2, 2],
    "qk_norm": True,
    "qkv_bias": False,
    "rope_dim_list": [32, 16, 16],
    "rope_theta": 256,
    "vae_time_compression_ratio": 4,
    "windows_size": 3,
}
TINY = dict(num_attention_heads=2, attention_head_dim=24, in_channels=4,
            out_channels=4, text_dim=32, freq_dim=32, ffn_dim=64,
            num_layers=2, patch_size=(1, 2, 2),
            qk_norm="rms_norm_across_heads", cross_attn_norm=True, eps=1e-6,
            use_memory=False, sigma_theta=0.0, action_config=ACTION)


@pytest.fixture(scope="module")
def ref_model():
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    try:
        mod = ref_loader.import_ref("fastvideo.models.dits.matrixgame3")
        ref_loader.patch_cpu_sdpa()
        ref_loader.init_ref_distributed()
        from fastvideo.configs.models.dits.matrixgame3 import (
            MatrixGame3WanVideoArchConfig, MatrixGame3WanVideoConfig)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = MatrixGame3WanVideoArchConfig(**TINY)
    cfg = MatrixGame3WanVideoConfig(arch_config=arch)
    torch.manual_seed(0)
    model = mod.MatrixGame3WanModel(cfg, {})
    with torch.no_grad():
        for p in model.parameters():
            torch.nn.init.normal_(p, std=0.04)
    model.eval()
    return model


@pytest.mark.parametrize("with_action", [False, True])
def test_matrixgame3_forward_parity(ref_model, with_action):
    import torch

    import jax.numpy as jnp
    from flax import nnx

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.configs.models.dits.matrixgame3 import (
        MATRIXGAME3_PARAM_NAMES_MAPPING, MatrixGame3ArchConfig)
    from fastvideo_tpu.models.dits.matrixgame3 import MatrixGame3WanModel
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    cfg = MatrixGame3ArchConfig(**TINY)
    ours = MatrixGame3WanModel(cfg, param_dtype=jnp.float32,
                               rngs=nnx.Rngs(0))
    sd = ref_model.state_dict()
    n = load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                     MATRIXGAME3_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"

    rng = np.random.default_rng(0)
    # 3 latent frames (12 raw frames + 1); 8x8 spatial
    x = rng.standard_normal((1, 4, 3, 8, 8)).astype(np.float32)
    txt = rng.standard_normal((1, 7, 32)).astype(np.float32)
    t = np.array([600.0], dtype=np.float32)
    kwargs = {}
    jkwargs = {}
    if with_action:
        # raw action frames: (n_frames - 1) % 4 == 0 with n_feats == 3
        n_frames = 9
        mouse = rng.standard_normal((1, n_frames, 2)).astype(np.float32)
        keyboard = (rng.random((1, n_frames, 6)) > 0.5).astype(np.float32)
        kwargs = dict(mouse_cond=torch.from_numpy(mouse),
                      keyboard_cond=torch.from_numpy(keyboard))
        jkwargs = dict(mouse_cond=jnp.asarray(mouse),
                       keyboard_cond=jnp.asarray(keyboard))

    from fastvideo.forward_context import set_forward_context

    with torch.no_grad(), set_forward_context(current_timestep=0,
                                              attn_metadata=None):
        ref_out = ref_model(torch.from_numpy(x), torch.from_numpy(txt),
                            torch.from_numpy(t), **kwargs).numpy()

    par.destroy_mesh()
    par.maybe_init_mesh(par.MeshConfig(dp_size=1, sp_size=1, tp_size=1))
    got = np.asarray(
        ours(jnp.asarray(x), jnp.asarray(txt), jnp.asarray(t), **jkwargs))
    par.destroy_mesh()
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, atol=5e-4, rtol=5e-3)
