"""LongCat-Video DiT parity vs the reference torch model (tiny, CPU)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

TINY = dict(hidden_size=64, depth=2, num_attention_heads=4,
            attention_head_dim=16, in_channels=4, out_channels=4,
            patch_size=(1, 2, 2), mlp_ratio=2, adaln_tembed_dim=32,
            caption_channels=24, frequency_embedding_size=32)


@pytest.fixture(scope="module")
def ref_model():
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    try:
        ref_loader.install()
        # the reference longcat imports its triton BSA kernels at module
        # level; import the (empty) real package chain, then stub only the
        # triton leaf so fastvideo.third_party.pynvml stays importable.
        import importlib

        for m in ("fastvideo.third_party",
                  "fastvideo.third_party.longcat_video",
                  "fastvideo.third_party.longcat_video."
                  "block_sparse_attention"):
            importlib.import_module(m)
        ref_loader._stub("fastvideo.third_party.longcat_video."
                         "block_sparse_attention.bsa_interface")
        mod = ref_loader.import_ref("fastvideo.models.dits.longcat")
        ref_loader.patch_cpu_sdpa()
        ref_loader.init_ref_distributed()
        from fastvideo.configs.models.dits.longcat import (
            LongCatVideoArchConfig, LongCatVideoConfig)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = LongCatVideoArchConfig(**TINY)
    cfg = LongCatVideoConfig(arch_config=arch)
    torch.manual_seed(0)
    model = mod.LongCatTransformer3DModel(cfg, {})
    with torch.no_grad():
        for p in model.parameters():
            torch.nn.init.normal_(p, std=0.04)
    model.eval()
    return model


def _build_ours(ref_model):
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.longcat import (
        LONGCAT_PARAM_NAMES_MAPPING, LongCatArchConfig)
    from fastvideo_tpu.models.dits.longcat import LongCatTransformer3DModel
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    cfg = LongCatArchConfig(**TINY)
    ours = LongCatTransformer3DModel(cfg, param_dtype=jnp.float32,
                                     rngs=nnx.Rngs(0))
    sd = {
        k: v
        for k, v in ref_model.state_dict().items() if "freqs" not in k
    }
    # the reference native module uses our target names already (to_q etc.
    # are separate there) — map its layout to ours
    n = load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                     _ref_native_mapping(), strict=True)
    # slot-merged (to_q/k/v -> fused) params count once per completed param
    assert n == len(sd) - TINY["depth"] * 6, f"loaded {n}/{len(sd)}"
    return ours


def _ref_native_mapping():
    """The reference native module (models/dits/longcat.py) keeps separate
    to_q/to_k/to_v — fuse them into our qkv / kv_linear slots."""
    return {
        r"^blocks\.(\d+)\.self_attn\.to_q\.(.*)$":
        (r"blocks.\1.self_attn.qkv.\2", 0, 3),
        r"^blocks\.(\d+)\.self_attn\.to_k\.(.*)$":
        (r"blocks.\1.self_attn.qkv.\2", 1, 3),
        r"^blocks\.(\d+)\.self_attn\.to_v\.(.*)$":
        (r"blocks.\1.self_attn.qkv.\2", 2, 3),
        r"^blocks\.(\d+)\.cross_attn\.to_q\.(.*)$":
        r"blocks.\1.cross_attn.q_linear.\2",
        r"^blocks\.(\d+)\.cross_attn\.to_k\.(.*)$":
        (r"blocks.\1.cross_attn.kv_linear.\2", 0, 2),
        r"^blocks\.(\d+)\.cross_attn\.to_v\.(.*)$":
        (r"blocks.\1.cross_attn.kv_linear.\2", 1, 2),
    }


@pytest.mark.parametrize("num_cond_latents", [0, 1])
def test_longcat_forward_parity(ref_model, num_cond_latents):
    import torch

    import jax.numpy as jnp

    ours = _build_ours(ref_model)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 3, 8, 8)).astype(np.float32)
    txt = rng.standard_normal((1, 7, 24)).astype(np.float32)
    mask = np.ones((1, 7), np.float32)
    mask[:, 5:] = 0
    t = np.array([600.0], dtype=np.float32)

    from fastvideo.forward_context import set_forward_context

    with torch.no_grad(), set_forward_context(current_timestep=0,
                                              attn_metadata=None):
        ref_out = ref_model(
            torch.from_numpy(x), torch.from_numpy(txt),
            torch.from_numpy(t),
            encoder_attention_mask=torch.from_numpy(mask),
            num_cond_latents=num_cond_latents).numpy()

    got = np.asarray(
        ours(jnp.asarray(x), jnp.asarray(txt), jnp.asarray(t),
             encoder_attention_mask=jnp.asarray(mask),
             num_cond_latents=num_cond_latents))
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, atol=3e-4, rtol=3e-3)


def test_longcat_per_frame_timestep(ref_model):
    """[B, T] per-frame timesteps (VC distilled path)."""
    import torch

    import jax.numpy as jnp

    ours = _build_ours(ref_model)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 4, 3, 8, 8)).astype(np.float32)
    txt = rng.standard_normal((1, 5, 24)).astype(np.float32)
    t = np.array([[0.0, 500.0, 900.0]], dtype=np.float32)

    from fastvideo.forward_context import set_forward_context

    with torch.no_grad(), set_forward_context(current_timestep=0,
                                              attn_metadata=None):
        ref_out = ref_model(torch.from_numpy(x), torch.from_numpy(txt),
                            torch.from_numpy(t)).numpy()
    got = np.asarray(ours(jnp.asarray(x), jnp.asarray(txt), jnp.asarray(t)))
    np.testing.assert_allclose(got, ref_out, atol=3e-4, rtol=3e-3)
