"""GLM-Image DiT parity vs the reference torch model (tiny, CPU)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

TINY = dict(num_attention_heads=2, attention_head_dim=16, in_channels=4,
            out_channels=4, num_layers=2, text_embed_dim=24,
            time_embed_dim=32, condition_dim=8,
            prior_vq_quantizer_codebook_size=32, patch_size=2)


@pytest.fixture(scope="module")
def ref_model():
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    try:
        mod = ref_loader.import_ref("fastvideo.models.dits.glm_image")
        ref_loader.patch_cpu_sdpa()
        ref_loader.init_ref_distributed()
        from fastvideo.configs.models.dits.glm_image import (
            GlmImageDiTArchConfig, GlmImageDiTConfig)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = GlmImageDiTArchConfig(**TINY)
    cfg = GlmImageDiTConfig(arch_config=arch)
    torch.manual_seed(0)
    model = mod.GlmImageTransformer2DModel(cfg, {})
    with torch.no_grad():
        for p in model.parameters():
            torch.nn.init.normal_(p, std=0.04)
    model.eval()
    return model


@pytest.mark.parametrize("drop_prior", [False, True])
def test_glm_image_forward_parity(ref_model, drop_prior):
    import torch

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.glm_image import (
        GLM_IMAGE_PARAM_NAMES_MAPPING, GlmImageArchConfig)
    from fastvideo_tpu.models.dits.glm_image import GlmImageTransformer2DModel
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    cfg = GlmImageArchConfig(**TINY)
    ours = GlmImageTransformer2DModel(cfg, param_dtype=jnp.float32,
                                      rngs=nnx.Rngs(0))
    sd = ref_model.state_dict()
    n = load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                     GLM_IMAGE_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    txt = rng.standard_normal((1, 6, 24)).astype(np.float32)
    prior_ids = rng.integers(0, 32, size=(1, 16)).astype(np.int64)
    prior_drop = np.array([drop_prior])
    t = np.array([500.0], dtype=np.float32)
    target_size = np.array([[32.0, 32.0]], np.float32)
    crop = np.array([[0.0, 0.0]], np.float32)

    from fastvideo.forward_context import set_forward_context

    with torch.no_grad(), set_forward_context(current_timestep=0,
                                              attn_metadata=None):
        ref_out = ref_model(
            torch.from_numpy(x), torch.from_numpy(txt),
            torch.from_numpy(prior_ids), torch.from_numpy(prior_drop),
            torch.from_numpy(t), torch.from_numpy(target_size),
            torch.from_numpy(crop)).numpy()

    got = np.asarray(
        ours(jnp.asarray(x), jnp.asarray(txt), jnp.asarray(prior_ids),
             jnp.asarray(prior_drop), jnp.asarray(t),
             jnp.asarray(target_size), jnp.asarray(crop)))
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, atol=3e-4, rtol=3e-3)


def test_glm_image_kv_cache(ref_model):
    """write-then-read KV cache parity: cached condition K/V prepended."""
    import torch

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.glm_image import (
        GLM_IMAGE_PARAM_NAMES_MAPPING, GlmImageArchConfig)
    from fastvideo_tpu.models.dits.glm_image import (GlmImageKVCache,
                                                     GlmImageTransformer2DModel)
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    cfg = GlmImageArchConfig(**TINY)
    ours = GlmImageTransformer2DModel(cfg, param_dtype=jnp.float32,
                                      rngs=nnx.Rngs(0))
    sd = ref_model.state_dict()
    load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                 GLM_IMAGE_PARAM_NAMES_MAPPING, strict=True)

    import fastvideo.models.dits.glm_image as ref_mod

    rng = np.random.default_rng(1)
    cond = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    txt = rng.standard_normal((1, 5, 24)).astype(np.float32)
    prior_ids = np.zeros((1, 16), np.int64)
    prior_drop = np.array([True])
    t = np.array([300.0], dtype=np.float32)
    tgt = np.array([[32.0, 32.0]], np.float32)
    crop = np.array([[0.0, 0.0]], np.float32)

    from fastvideo.forward_context import set_forward_context

    ref_cache = ref_mod.GlmImageKVCache(TINY["num_layers"])
    with torch.no_grad(), set_forward_context(current_timestep=0,
                                              attn_metadata=None):
        ref_model(torch.from_numpy(cond), torch.from_numpy(txt),
                  torch.from_numpy(prior_ids), torch.from_numpy(prior_drop),
                  torch.from_numpy(t), torch.from_numpy(tgt),
                  torch.from_numpy(crop), kv_caches=ref_cache,
                  kv_caches_mode="write")
        ref_out = ref_model(torch.from_numpy(x), torch.from_numpy(txt),
                            torch.from_numpy(prior_ids),
                            torch.from_numpy(prior_drop),
                            torch.from_numpy(t), torch.from_numpy(tgt),
                            torch.from_numpy(crop), kv_caches=ref_cache,
                            kv_caches_mode="read").numpy()

    cache = GlmImageKVCache(TINY["num_layers"])
    ours(jnp.asarray(cond), jnp.asarray(txt), jnp.asarray(prior_ids),
         jnp.asarray(prior_drop), jnp.asarray(t), jnp.asarray(tgt),
         jnp.asarray(crop), kv_caches=cache, kv_caches_mode="write")
    got = np.asarray(
        ours(jnp.asarray(x), jnp.asarray(txt), jnp.asarray(prior_ids),
             jnp.asarray(prior_drop), jnp.asarray(t), jnp.asarray(tgt),
             jnp.asarray(crop), kv_caches=cache, kv_caches_mode="read"))
    np.testing.assert_allclose(got, ref_out, atol=3e-4, rtol=3e-3)
