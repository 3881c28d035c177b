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
