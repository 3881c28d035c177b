"""Stable Audio DiT parity vs the reference torch model (tiny, CPU)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

TINY = dict(io_channels=8, embed_dim=128, depth=2, num_attention_heads=2,
            cond_token_dim=64, global_cond_dim=16,
            project_cond_tokens=False, project_global_cond=True,
            qk_norm="ln")


@pytest.fixture(scope="module")
def ref_model():
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    try:
        mod = ref_loader.import_ref("fastvideo.models.dits.stable_audio")
        ref_loader.patch_cpu_sdpa()
        ref_loader.init_ref_distributed()
        from fastvideo.configs.models.dits.stable_audio import (
            StableAudioArchConfig)
        from fastvideo.configs.models.dits import StableAudioConfig
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = StableAudioArchConfig(**TINY)
    cfg = StableAudioConfig(arch_config=arch)
    torch.manual_seed(0)
    model = mod.StableAudioDiT(cfg, {})
    with torch.no_grad():
        for p in model.parameters():
            torch.nn.init.normal_(p, std=0.05)
    model.eval()
    return model


def test_stable_audio_forward_parity(ref_model):
    import torch

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.stable_audio import (
        STABLE_AUDIO_PARAM_NAMES_MAPPING, StableAudioArchConfig)
    from fastvideo_tpu.models.dits.stable_audio import StableAudioDiT
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    cfg = StableAudioArchConfig(**TINY)
    ours = StableAudioDiT(cfg, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    sd = {k: v for k, v in ref_model.state_dict().items()
          if "inv_freq" not in k and ".scale" not in k}
    n = load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                     STABLE_AUDIO_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 8, 20)).astype(np.float32)
    t = np.array([0.4], dtype=np.float32)
    cond = rng.standard_normal((1, 5, 64)).astype(np.float32)
    glob = rng.standard_normal((1, 16)).astype(np.float32)

    from fastvideo.forward_context import set_forward_context

    with torch.no_grad(), set_forward_context(current_timestep=0,
                                              attn_metadata=None):
        ref_out = ref_model(torch.from_numpy(x), torch.from_numpy(t),
                            cross_attn_cond=torch.from_numpy(cond),
                            global_embed=torch.from_numpy(glob)).numpy()

    got = np.asarray(
        ours(jnp.asarray(x), jnp.asarray(t),
             cross_attn_cond=jnp.asarray(cond),
             global_embed=jnp.asarray(glob)))
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, atol=3e-4, rtol=3e-3)
