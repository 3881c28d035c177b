"""LingBot-Video DiT parity vs the reference torch model (tiny, CPU)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

DENSE = dict(patch_size=(1, 2, 2), in_channels=4, out_channels=4,
             hidden_size=48, num_attention_heads=2, depth=2,
             intermediate_size=64, text_dim=24, freq_dim=32,
             axes_dims=(8, 8, 8), axes_lens=(64, 32, 32), num_experts=0)
MOE = dict(DENSE, num_experts=4, num_experts_per_tok=2,
           moe_intermediate_size=32, n_shared_experts=1,
           score_func="sigmoid", norm_topk_prob=True,
           routed_scaling_factor=1.5)


def _build_pair(variant):
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    try:
        mod = ref_loader.import_ref("fastvideo.models.dits.lingbot_video")
        ref_loader.patch_cpu_sdpa()
        ref_loader.init_ref_distributed()
        from fastvideo.configs.models.dits.lingbot_video import (
            LingBotVideoArchConfig, LingBotVideoConfig)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = LingBotVideoArchConfig(**variant)
    cfg = LingBotVideoConfig(arch_config=arch)
    torch.manual_seed(0)
    ref = mod.LingBotVideoTransformer3DModel(cfg, {})
    with torch.no_grad():
        for p in ref.parameters():
            torch.nn.init.normal_(p, std=0.05)
    ref.eval()

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.lingbot_video import (
        LINGBOT_VIDEO_PARAM_NAMES_MAPPING,
        LingBotVideoArchConfig as MyArch)
    from fastvideo_tpu.models.dits.lingbot_video import (
        LingBotVideoTransformer3DModel)
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    ours = LingBotVideoTransformer3DModel(MyArch(**variant),
                                          param_dtype=jnp.float32,
                                          rngs=nnx.Rngs(0))
    sd = ref.state_dict()
    n = load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                     LINGBOT_VIDEO_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"
    return ref, ours


@pytest.mark.parametrize("variant", [DENSE, MOE], ids=["dense", "moe"])
def test_lingbot_video_forward_parity(variant):
    import torch

    import jax.numpy as jnp

    ref, ours = _build_pair(variant)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)
    txt = rng.standard_normal((1, 6, 24)).astype(np.float32)
    t = np.array([500.0], dtype=np.float32)

    from fastvideo.forward_context import set_forward_context

    with torch.no_grad(), set_forward_context(current_timestep=0,
                                              attn_metadata=None):
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t),
                      torch.from_numpy(txt)).sample.numpy()

    got = np.asarray(ours(jnp.asarray(x), jnp.asarray(t), jnp.asarray(txt)))
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, atol=3e-4, rtol=3e-3)
