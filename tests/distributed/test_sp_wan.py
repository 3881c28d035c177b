"""SP equivalence: tiny Wan under sp=4 matches single-device output.

Port of /root/reference/fastvideo/tests/distributed/test_sp_wan.py:26-50
(tiny random-weight model, SP world vs full model) onto the CPU mesh.
"""

import numpy as np
import pytest


@pytest.mark.parametrize("shape", [(1, 4, 4, 8, 8), (1, 4, 3, 6, 10)])
def test_sp4_matches_single(shape):
    import jax
    import jax.numpy as jnp
    from flax import nnx

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel

    cfg = WanArchConfig(num_attention_heads=4, attention_head_dim=24,
                        in_channels=4, out_channels=4, text_dim=32,
                        freq_dim=32, ffn_dim=64, num_layers=2, text_len=16)
    model = WanTransformer3DModel(cfg, param_dtype=jnp.float32,
                                  rngs=nnx.Rngs(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 16, 32)), dtype=jnp.float32)
    ts = jnp.asarray([500.0])

    par.destroy_mesh()
    mesh1 = par.init_mesh(par.MeshConfig(1, 1, 1),
                          devices=jax.devices()[:1])
    with par.mesh_context(mesh1):
        ref = np.asarray(model(x, ctx, ts))
    mesh4 = par.init_mesh(par.MeshConfig(1, 4, 1),
                          devices=jax.devices()[:4])
    with par.mesh_context(mesh4):
        out = np.asarray(model(x, ctx, ts))
    par.destroy_mesh()
    assert np.abs(ref - out).max() < 5e-5


def test_dp2_sp2_training_shapes():
    """dp x sp mesh: training step runs with batch sharded over dp."""
    import jax
    import jax.numpy as jnp
    from flax import nnx

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.fastvideo_args import TrainingArgs
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel
    from fastvideo_tpu.models.schedulers.flow_match_euler import (
        FlowMatchEulerDiscreteScheduler)
    from fastvideo_tpu.training.training_pipeline import TrainingPipeline

    par.destroy_mesh()
    cfg = WanArchConfig(num_attention_heads=4, attention_head_dim=8,
                        in_channels=4, out_channels=4, text_dim=16,
                        freq_dim=16, ffn_dim=32, num_layers=1)
    model = WanTransformer3DModel(cfg, param_dtype=jnp.float32,
                                  rngs=nnx.Rngs(0))
    sched = FlowMatchEulerDiscreteScheduler(shift=3.0)
    sched.set_timesteps(1000)
    args = TrainingArgs(num_gpus=4, dp_size=2, sp_size=2,
                        learning_rate=1e-3, seed=0, output_dir="")
    pipe = TrainingPipeline(model, sched, args)
    rng = np.random.default_rng(0)
    latents = rng.standard_normal((1, 2, 4, 2, 8, 8)).astype(np.float32)
    embeds = rng.standard_normal((1, 2, 8, 16)).astype(np.float32)
    m = pipe.train_one_step(latents, embeds)
    assert np.isfinite(m["loss"])
    par.destroy_mesh()
