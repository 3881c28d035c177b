"""LTX-2 AV transformer parity vs the reference torch model.

Identical tiny random weights, fixed inputs, split rope, joint
audio+video forward including the denoised (x - v*sigma) conversion.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

TINY = dict(num_attention_heads=2, attention_head_dim=8, num_layers=2,
            cross_attention_dim=16, caption_channels=24,
            num_channels_latents=4,
            audio_num_attention_heads=2, audio_attention_head_dim=8,
            audio_in_channels=8, audio_out_channels=8,
            audio_cross_attention_dim=16, rope_type="split")


@pytest.fixture(scope="module")
def ref_model():
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    try:
        mod = ref_loader.import_ref("fastvideo.models.dits.ltx2")
        from fastvideo.configs.models.dits.ltx2 import (LTX2VideoArchConfig,
                                                        LTX2VideoConfig)
        ref_loader.patch_cpu_sdpa()
        ref_loader.init_ref_distributed()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = LTX2VideoArchConfig(**TINY)
    cfg = LTX2VideoConfig(arch_config=arch)
    torch.manual_seed(0)
    model = mod.LTX2Transformer3DModel(cfg, {})
    with torch.no_grad():
        for p in model.parameters():
            torch.nn.init.normal_(p, std=0.05)
    model.eval()
    return model


def _build_jax(ref_model):
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.dits.ltx2 import (LTX2_PARAM_NAMES_MAPPING,
                                                LTX2ArchConfig,
                                                LTX2Transformer3DModel)
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    cfg = LTX2ArchConfig(
        num_attention_heads=TINY["num_attention_heads"],
        attention_head_dim=TINY["attention_head_dim"],
        num_layers=TINY["num_layers"],
        cross_attention_dim=TINY["cross_attention_dim"],
        caption_channels=TINY["caption_channels"],
        in_channels=4, out_channels=4,
        audio_num_attention_heads=TINY["audio_num_attention_heads"],
        audio_attention_head_dim=TINY["audio_attention_head_dim"],
        audio_in_channels=TINY["audio_in_channels"],
        audio_out_channels=TINY["audio_out_channels"],
        audio_cross_attention_dim=TINY["audio_cross_attention_dim"],
        rope_type="split")
    model = LTX2Transformer3DModel(cfg, param_dtype=jnp.float32,
                                   rngs=nnx.Rngs(0))
    sd = ref_model.state_dict()
    n = load_weights(model, ((k, v.detach().numpy())
                             for k, v in sd.items()),
                     LTX2_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"
    return model


def test_ltx2_av_forward_parity(ref_model):
    import torch

    import fastvideo_tpu.parallel as par

    jax_model = _build_jax(ref_model)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 2, 4, 4)).astype(np.float32)
    ax = rng.standard_normal((1, 2, 3, 4)).astype(np.float32)  # c*mel = 8
    ctx = rng.standard_normal((1, 6, 24)).astype(np.float32)
    t = np.full((1,), 0.7, np.float32)

    from fastvideo.forward_context import set_forward_context

    with torch.no_grad(), set_forward_context(current_timestep=0,
                                              attn_metadata=None):
        ref_v, ref_a = ref_model(
            hidden_states=torch.from_numpy(x),
            encoder_hidden_states=torch.from_numpy(ctx),
            timestep=torch.from_numpy(t),
            audio_hidden_states=torch.from_numpy(ax),
            audio_encoder_hidden_states=torch.from_numpy(ctx),
            audio_timestep=torch.from_numpy(t),
        )
    ref_v, ref_a = ref_v.numpy(), ref_a.numpy()

    import jax.numpy as jnp

    par.destroy_mesh()
    mesh = par.maybe_init_mesh(par.MeshConfig(dp_size=1, sp_size=1,
                                              tp_size=1))
    with par.mesh.mesh_context(mesh):
        got_v, got_a = jax_model(
            jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(t),
            audio_hidden_states=jnp.asarray(ax),
            audio_encoder_hidden_states=jnp.asarray(ctx),
            audio_timestep=jnp.asarray(t))
    got_v, got_a = np.asarray(got_v), np.asarray(got_a)

    assert got_v.shape == ref_v.shape and got_a.shape == ref_a.shape
    for name, ref, got in (("video", ref_v, got_v),
                           ("audio", ref_a, got_a)):
        err = np.abs(ref - got).max()
        scale = np.abs(ref).max()
        assert err / scale < 2e-4, \
            f"{name} max rel err {err / scale} (abs {err})"
    par.destroy_mesh()
