"""Tensor-parallel equivalence + SPMD-efficiency tests.

Analog of the reference's TP linear tests
(/root/reference/fastvideo/layers/linear.py:344,922 semantics: column-sharded
q/k/v + row-sharded out projection, one all-reduce). Here sharding comes from
``tp_axes`` metadata consumed by ``parallel.shard_state``; equivalence is
checked by comparing a tp-sharded run against a replicated single-device run,
and SPMD efficiency by asserting the dryrun emits no involuntary full
rematerialization.
"""

import subprocess
import sys

import numpy as np
import pytest


def _tiny_wan():
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.configs.models.dits.wan import WanArchConfig
    from fastvideo_tpu.models.dits.wan import WanTransformer3DModel

    cfg = WanArchConfig(num_attention_heads=4, attention_head_dim=24,
                        in_channels=4, out_channels=4, text_dim=32,
                        freq_dim=32, ffn_dim=64, num_layers=2, text_len=16)
    return WanTransformer3DModel(cfg, param_dtype=jnp.float32,
                                 rngs=nnx.Rngs(0))


def test_linear_tp_metadata():
    """Column/Row linears declare tp_axes on kernel AND bias."""
    import jax.numpy as jnp
    from flax import nnx

    from fastvideo_tpu.layers.linear import (ColumnParallelLinear,
                                             RowParallelLinear)

    col = ColumnParallelLinear(8, 16, param_dtype=jnp.float32,
                               rngs=nnx.Rngs(0))
    row = RowParallelLinear(16, 8, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    assert col.kernel.tp_axes == (None, "tp")
    assert col.bias.tp_axes == ("tp",)
    assert row.kernel.tp_axes == ("tp", None)
    assert row.bias.tp_axes == (None,)


@pytest.mark.parametrize("layout", [(1, 1, 2), (1, 2, 2), (2, 2, 2)])
def test_wan_tp_matches_single(layout):
    """Wan forward under tp (x sp x dp) matches the replicated run."""
    import jax
    import jax.numpy as jnp
    from flax import nnx

    import fastvideo_tpu.parallel as par

    dp, sp, tp = layout
    model = _tiny_wan()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((dp, 4, 4, 8, 8)), dtype=jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((dp, 16, 32)), dtype=jnp.float32)
    ts = jnp.full((dp,), 500.0, jnp.float32)

    par.destroy_mesh()
    mesh1 = par.init_mesh(par.MeshConfig(1, 1, 1), devices=jax.devices()[:1])
    with par.mesh_context(mesh1):
        ref = np.asarray(model(x, ctx, ts))

    mesh = par.init_mesh(par.MeshConfig(dp, sp, tp),
                         devices=jax.devices()[:dp * sp * tp])
    graphdef, state = nnx.split(model)
    with par.mesh_context(mesh):
        state_tp = par.shard_state(state, mesh)
        model_tp = nnx.merge(graphdef, state_tp)
        out = np.asarray(model_tp(x, ctx, ts))
    par.destroy_mesh()
    assert np.abs(ref - out).max() < 5e-5


def test_shard_state_places_tp_and_fsdp():
    """Declared tp dims get the tp axis; big undeclared params get fsdp."""
    import jax
    from flax import nnx

    import fastvideo_tpu.parallel as par

    par.destroy_mesh()
    mesh = par.init_mesh(par.MeshConfig(2, 1, 2), devices=jax.devices()[:4])
    model = _tiny_wan()
    _, state = nnx.split(model)
    state = par.shard_state(state, mesh, fsdp_axis=par.DP_AXIS,
                            min_fsdp_size=512)
    flat = dict(state.flat_state())
    specs = {"/".join(str(k) for k in path): v.get_value().sharding.spec
             for path, v in flat.items()}
    qk = next(v for k, v in specs.items()
              if "blocks/0" in k and "to_q" in k and "kernel" in k)
    assert "tp" in tuple(qk), qk
    par.destroy_mesh()


def test_opt_state_inherits_param_layout():
    """optax moments carry the params' tp metadata through shard_state."""
    import jax
    import optax
    from flax import nnx

    import fastvideo_tpu.parallel as par

    par.destroy_mesh()
    mesh = par.init_mesh(par.MeshConfig(1, 1, 2), devices=jax.devices()[:2])
    model = _tiny_wan()
    _, state = nnx.split(model)
    opt_state = optax.adamw(1e-4).init(state)
    opt_state = par.shard_state(opt_state, mesh)
    mu = opt_state[0].mu
    flat = dict(mu.flat_state())
    qk = next(v for path, v in flat.items()
              if "to_q" in tuple(str(k) for k in path)
              and "kernel" in tuple(str(k) for k in path))
    assert "tp" in tuple(qk.get_value().sharding.spec)
    par.destroy_mesh()


def test_dryrun_no_involuntary_remat():
    """The driver dryrun must not trip GSPMD full rematerialization."""
    proc = subprocess.run(
        [sys.executable, "-u", "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        capture_output=True, text=True, timeout=600)
    combined = proc.stdout + proc.stderr
    assert proc.returncode == 0, combined[-2000:]
    assert "Involuntary full rematerialization" not in combined, \
        combined[-2000:]
