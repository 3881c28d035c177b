"""MiniMax H3 DiT parity vs the reference torch model (tiny, CPU)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import ref_loader  # noqa: E402

TINY = dict(num_attention_heads=2, attention_head_dim=32, hidden_size=64,
            num_layers=2, num_refiner_layers=1, ffn_dim=96, in_channels=4,
            audio_in_channels=8, patch_size=(1, 2, 2), text_dim=24,
            freq_dim=32, time_embed_hidden_dim=64, time_embed_dim=48,
            rope_freq_dim=4, rope_theta=10000.0)


@pytest.fixture(scope="module")
def ref_model():
    os.environ["FASTVIDEO_ATTENTION_BACKEND"] = "TORCH_SDPA"
    try:
        mod = ref_loader.import_ref("fastvideo.models.dits.minimax_h3")
        ref_loader.patch_cpu_sdpa()
        ref_loader.init_ref_distributed()
        from fastvideo.configs.models.dits.minimax_h3 import (
            MiniMaxH3ArchConfig, MiniMaxH3Config)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    import torch

    arch = MiniMaxH3ArchConfig(**TINY)
    cfg = MiniMaxH3Config(arch_config=arch)
    torch.manual_seed(0)
    model = mod.MiniMaxH3Transformer3DModel(cfg, {})
    with torch.no_grad():
        for p in model.parameters():
            torch.nn.init.normal_(p, std=0.04)
    model.eval()
    return model


def test_minimax_h3_forward_parity(ref_model):
    import torch

    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.minimax_h3 import (
        MINIMAX_H3_PARAM_NAMES_MAPPING, MiniMaxH3ArchConfig)
    from fastvideo_tpu.models.dits.minimax_h3 import (
        MiniMaxH3Transformer3DModel)
    from fastvideo_tpu.models.loader.weight_utils import load_weights

    cfg = MiniMaxH3ArchConfig(**TINY)
    ours = MiniMaxH3Transformer3DModel(cfg, param_dtype=jnp.float32,
                                       rngs=nnx.Rngs(0))
    sd = {k: v for k, v in ref_model.state_dict().items()
          if "inv_freq" not in k}
    n = load_weights(ours, ((k, v.detach().numpy()) for k, v in sd.items()),
                     MINIMAX_H3_PARAM_NAMES_MAPPING, strict=True)
    assert n == len(sd), f"loaded {n}/{len(sd)}"

    rng = np.random.default_rng(0)
    # packed doc: 5 text rows, 8 video rows (2x2x2 grid), 3 audio rows
    n_text, n_video, n_audio = 5, 8, 3
    seq = n_text + n_video + n_audio
    video = rng.standard_normal((1, n_video, 4 * 1 * 2 * 2)).astype(
        np.float32)
    audio = rng.standard_normal((1, n_audio, 8)).astype(np.float32)
    text = rng.standard_normal((1, n_text, 24)).astype(np.float32)
    # layout: [text | video | audio]
    text_idx = np.arange(n_text)
    video_idx = np.arange(n_text, n_text + n_video)
    audio_idx = np.arange(n_text + n_video, seq)
    token_tags = np.concatenate([np.full(n_text, 2), np.full(n_video, 0),
                                 np.full(n_audio, 1)]).astype(np.int64)
    timestep = np.array([700.0, 0.0], dtype=np.float32)
    timestep_indices = np.concatenate(
        [np.zeros(n_text), np.zeros(n_video), np.ones(n_audio)]).astype(
            np.int64)
    pos = rng.integers(0, 6, size=(seq, 3)).astype(np.int64)

    from fastvideo.forward_context import set_forward_context

    with torch.no_grad(), set_forward_context(current_timestep=0,
                                              attn_metadata=None):
        ref_v, ref_a = ref_model(
            torch.from_numpy(video), torch.from_numpy(audio),
            torch.from_numpy(text), torch.from_numpy(timestep),
            torch.from_numpy(timestep_indices),
            torch.from_numpy(token_tags), torch.from_numpy(pos),
            torch.from_numpy(video_idx), torch.from_numpy(audio_idx),
            torch.from_numpy(text_idx))

    got_v, got_a = ours(
        jnp.asarray(video), jnp.asarray(audio), jnp.asarray(text),
        jnp.asarray(timestep), jnp.asarray(timestep_indices),
        jnp.asarray(token_tags), jnp.asarray(pos), jnp.asarray(video_idx),
        jnp.asarray(audio_idx), jnp.asarray(text_idx))
    np.testing.assert_allclose(np.asarray(got_v), ref_v.numpy(), atol=3e-4,
                               rtol=3e-3)
    np.testing.assert_allclose(np.asarray(got_a), ref_a.numpy(), atol=3e-4,
                               rtol=3e-3)
