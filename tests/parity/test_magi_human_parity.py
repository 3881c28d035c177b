"""daVinci-MagiHuman DiT parity vs the reference torch model (tiny, CPU)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

TINY = dict(num_layers=6, hidden_size=64, head_dim=16, num_query_groups=2,
            video_in_channels=16, audio_in_channels=8, text_in_channels=24,
            mm_layers=(0, 5), gelu7_layers=(0,), post_norm_layers=(5,),
            local_attn_layers=(), enable_attn_gating=True)


@pytest.fixture(scope="module")
def ref_model():
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    try:
        mod = ref_loader.import_ref("fastvideo.models.dits.magi_human")
        ref_loader.patch_cpu_sdpa()
        ref_loader.init_ref_distributed()
        from fastvideo.configs.models.dits.magi_human import (
            MagiHumanArchConfig, MagiHumanVideoConfig)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = MagiHumanArchConfig(**TINY)
    cfg = MagiHumanVideoConfig(arch_config=arch)
    torch.manual_seed(0)
    model = mod.MagiHumanDiT(cfg, {})
    # packed-expert linears default to bf16; run the parity check fully
    # in fp32 (the forward reads its compute dtype from the weights)
    model = model.float()
    with torch.no_grad():
        for p in model.parameters():
            torch.nn.init.normal_(p, std=0.04)
    model.eval()
    return model


@pytest.mark.parametrize("local_attn", [False, True])
def test_magi_human_forward_parity(ref_model, local_attn):
    import torch

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.magi_human import (
        MAGI_HUMAN_PARAM_NAMES_MAPPING, MagiHumanArchConfig)
    from fastvideo_tpu.models.dits.magi_human import MagiHumanDiT
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    cfg = MagiHumanArchConfig(**TINY)
    if local_attn:
        cfg.local_attn_layers = (2,)
        cfg.frame_receptive_field = 1
        ref_model.configure_local_attention((2,), frame_receptive_field=1)
    else:
        ref_model.configure_local_attention(())
    ours = MagiHumanDiT(cfg, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    sd = {k: v for k, v in ref_model.state_dict().items()
          if "bands" not in k}
    # the reference's packed-expert linears default to bf16; upcast for
    # the fp32 parity comparison
    n = load_weights(
        ours, ((k, v.detach().float().numpy()) for k, v in sd.items()),
        MAGI_HUMAN_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"

    rng = np.random.default_rng(0)
    # 3 frames x 4 tokens video, 4 audio, 5 text
    nv, na, nt = 12, 4, 5
    L = nv + na + nt
    max_ch = max(TINY["video_in_channels"], TINY["text_in_channels"])
    x = rng.standard_normal((L, max_ch)).astype(np.float32)
    modality = np.concatenate(
        [np.zeros(nv), np.ones(na), np.full(nt, 2)]).astype(np.int64)
    coords = np.zeros((L, 9), np.float64)
    # video coords: (t, h, w) on a 3x2x2 grid with sizes + ref sizes
    grid = np.stack(np.meshgrid(np.arange(3), np.arange(2), np.arange(2),
                                indexing="ij"), -1).reshape(-1, 3)
    coords[:nv, :3] = grid
    coords[:nv, 3:6] = [3, 2, 2]
    coords[:nv, 6:9] = [3, 4, 4]
    coords[nv:nv + na, 0] = np.arange(na)
    coords[nv:nv + na, 3:9] = 1
    coords[nv + na:, 0] = np.arange(nt)
    coords[nv + na:, 3:9] = 1

    from fastvideo.forward_context import set_forward_context

    with torch.no_grad(), set_forward_context(current_timestep=0,
                                              attn_metadata=None):
        ref_out = ref_model(
            torch.from_numpy(x), torch.from_numpy(coords),
            torch.from_numpy(modality)).numpy()

    got = np.asarray(ours(jnp.asarray(x), coords, modality))
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, atol=5e-4, rtol=5e-3)
