"""SP padding invariants: models whose token count is NOT divisible by sp
must pad their rope tables / per-token modulation along with the tokens
(regression for the dropped-invariant copies of the trunk forward).
"""

import numpy as np
import pytest


def _meshes(par, jax, sp):
    par.destroy_mesh()
    mesh1 = par.init_mesh(par.MeshConfig(1, 1, 1), devices=jax.devices()[:1])
    meshN = par.init_mesh(par.MeshConfig(1, sp, 1),
                          devices=jax.devices()[:sp])
    return mesh1, meshN


def test_wan_per_token_timestep_sp2_odd_tokens():
    """TI2V-style per-token timesteps with tokens % sp != 0."""
    import jax
    import jax.numpy as jnp
    from flax import nnx

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel

    cfg = WanArchConfig(num_attention_heads=2, attention_head_dim=24,
                        in_channels=4, out_channels=4, text_dim=32,
                        freq_dim=32, ffn_dim=64, num_layers=2, text_len=16)
    model = WanTransformer3DModel(cfg, param_dtype=jnp.float32,
                                  rngs=nnx.Rngs(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 3, 6, 10)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 16, 32)), jnp.float32)
    n_tok = 3 * 3 * 5  # 45 tokens -> not divisible by sp=2
    ts = jnp.full((1, n_tok), 500.0, jnp.float32)

    par.destroy_mesh()
    mesh1, mesh2 = _meshes(par, jax, 2)
    with par.mesh_context(mesh1):
        ref = np.asarray(model(x, ctx, ts))
    with par.mesh_context(mesh2):
        out = np.asarray(model(x, ctx, ts))
    par.destroy_mesh()
    assert np.abs(ref - out).max() < 5e-5


def test_flux_sp2_odd_tokens():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    import fastvideo_tpu.parallel as par
    from fastvideo_tpu.models.dits.flux import (FluxArchConfig,
                                                FluxTransformer2DModel)

    cfg = FluxArchConfig(num_layers=1, num_single_layers=1,
                         attention_head_dim=8, num_attention_heads=2,
                         in_channels=4, joint_attention_dim=16,
                         pooled_projection_dim=16, guidance_embeds=False,
                         axes_dims_rope=(2, 4, 2))
    model = FluxTransformer2DModel(cfg, param_dtype=jnp.float32,
                                   rngs=nnx.Rngs(0))
    rng = np.random.default_rng(1)
    n = 9  # odd token count
    x = jnp.asarray(rng.standard_normal((1, n, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 5, 16)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((1, 16)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 4, (n, 3)), jnp.float32)
    ts = jnp.asarray([0.5], jnp.float32)

    par.destroy_mesh()
    mesh1, mesh2 = _meshes(par, jax, 2)
    with par.mesh_context(mesh1):
        ref = np.asarray(model(x, ctx, ts, pooled, ids))
    with par.mesh_context(mesh2):
        out = np.asarray(model(x, ctx, ts, pooled, ids))
    par.destroy_mesh()
    assert np.abs(ref - out).max() < 5e-5
