"""Streaming generator: blocks produce frames; writer collects them."""

import numpy as np


def test_streaming_generator(tmp_path):
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig
    from fastvideo_tpu.entrypoints.streaming_generator import (
        StreamingVideoGenerator)
    from fastvideo_tpu.models.dits.causal_wan import (
        CausalWanTransformer3DModel)
    from fastvideo_tpu.models.schedulers.flow_match_euler import (
        FlowMatchEulerDiscreteScheduler)
    from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan

    dit_cfg = WanArchConfig(num_attention_heads=2, attention_head_dim=8,
                            in_channels=4, out_channels=4, text_dim=16,
                            freq_dim=16, ffn_dim=32, num_layers=2,
                            num_frames_per_block=2, local_attn_size=4)
    vae_cfg = WanVAEArchConfig(base_dim=8, z_dim=4, dim_mult=(1, 2),
                               num_res_blocks=1, attn_scales=(),
                               temperal_downsample=(True,),
                               latents_mean=tuple([0.0] * 4),
                               latents_std=tuple([1.0] * 4),
                               scale_factor_temporal=2,
                               scale_factor_spatial=2)
    dit = CausalWanTransformer3DModel(dit_cfg, param_dtype=jnp.float32,
                                      rngs=nnx.Rngs(0))
    vae = AutoencoderKLWan(vae_cfg, load_encoder=False,
                           param_dtype=jnp.float32, rngs=nnx.Rngs(1))
    sched = FlowMatchEulerDiscreteScheduler(shift=5.0)
    gen = StreamingVideoGenerator(dit, vae, scheduler=sched,
                                  num_inference_steps=2, height=16,
                                  width=16, dtype=jnp.float32)
    out = str(tmp_path / "stream.mp4")
    gen.reset("test prompt", output_path=out)
    f1 = gen.step()
    f2 = gen.step()
    f3 = gen.step()
    # VAE streaming: first chunk -> 2*2-1=3 frames, later chunks 4 each
    assert f1.shape[1:] == (16, 16, 3)
    assert f2.shape[0] == 4 and f3.shape[0] == 4
    assert np.isfinite(f1.astype(np.float32)).all()
    total = gen.finalize()
    assert total == f1.shape[0] + 8


def test_streaming_decode_frame_split():
    """Decoding a chunk one latent frame at a time through the StreamCache
    equals decoding the whole chunk at once (the invariant the streaming
    generator's memory-bounded per-frame decode relies on)."""
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.vaes.wan import WanVAEArchConfig
    from fastvideo_tpu.models.vaes.wan import AutoencoderKLWan

    vae_cfg = WanVAEArchConfig(base_dim=8, z_dim=4, dim_mult=(1, 2),
                               num_res_blocks=1, attn_scales=(),
                               temperal_downsample=(True,),
                               latents_mean=tuple([0.0] * 4),
                               latents_std=tuple([1.0] * 4),
                               scale_factor_temporal=2,
                               scale_factor_spatial=2)
    vae = AutoencoderKLWan(vae_cfg, load_encoder=False,
                           param_dtype=jnp.float32, rngs=nnx.Rngs(1))
    z = jax.random.normal(jax.random.key(0), (1, 4, 3, 8, 8), jnp.float32)

    whole, cache_w = vae.streaming_decode(z, None, is_first_chunk=True)
    parts, cache = [], None
    for i in range(z.shape[2]):
        px, cache = vae.streaming_decode(z[:, :, i:i + 1], cache,
                                         is_first_chunk=i == 0)
        parts.append(px)
    split = jnp.concatenate(parts, axis=2)
    assert split.shape == whole.shape
    import numpy as np

    np.testing.assert_allclose(np.asarray(split), np.asarray(whole),
                               atol=2e-5, rtol=1e-5)
    # a follow-on chunk decoded per-frame continues from the same state
    z2 = jax.random.normal(jax.random.key(1), (1, 4, 2, 8, 8), jnp.float32)
    whole2, _ = vae.streaming_decode(z2, cache_w)
    parts2 = []
    for i in range(z2.shape[2]):
        px, cache = vae.streaming_decode(z2[:, :, i:i + 1], cache)
        parts2.append(px)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(parts2, axis=2)),
                               np.asarray(whole2), atol=2e-5, rtol=1e-5)
