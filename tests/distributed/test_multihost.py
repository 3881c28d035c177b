"""Multi-host readiness: 2-process jax.distributed on CPU.

SURVEY §7 hard-part bullet "Multi-host": dp-over-DCN must work with no
code changes beyond environment configuration. This launches two python
processes, each with 4 virtual CPU devices, initializes
``jax.distributed`` via ``maybe_init_distributed`` (env-var path, exactly
how a production launcher would), builds the standard dp x sp x tp mesh
over the 8 GLOBAL devices, and runs a cross-process psum + one sharded
matmul through the mesh.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

from fastvideo_tpu.parallel import (MeshConfig, maybe_init_distributed,
                                    maybe_init_mesh)
import fastvideo_tpu.parallel as par

assert maybe_init_distributed(), "distributed init did not trigger"
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4, jax.local_device_count()

mesh = maybe_init_mesh(MeshConfig(dp_size=2, sp_size=2, tp_size=2))
assert mesh.devices.size == 8

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

# dp-sharded global array: each process contributes its local shard
pid = jax.process_index()
sharding = NamedSharding(mesh, P("dp"))
global_shape = (8, 16)
local = jnp.full((4, 16), float(pid + 1), jnp.float32)
# P("dp") shards rows across dp only; every (sp, tp) replica on this
# process holds the same (4, 16) local block
arr = jax.make_array_from_single_device_arrays(
    global_shape, sharding,
    [jax.device_put(local, d) for d in jax.local_devices()])

@jax.jit
def total(x):
    return jnp.sum(x)

# process 0 shards hold 1.0, process 1 shards hold 2.0 -> sum = 4*16*1+4*16*2
t = float(total(arr))
assert abs(t - (4*16*1 + 4*16*2)) < 1e-5, t
print(f"proc {pid} OK total={t}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_mesh(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "FASTVIDEO_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "FASTVIDEO_NUM_PROCESSES": "2",
            "FASTVIDEO_PROCESS_ID": str(pid),
            "PYTHONPATH": REPO,
        })
        env.pop("JAX_NUM_CPU_DEVICES", None)
        procs.append(
            subprocess.Popen([sys.executable, "-c", _WORKER], env=env,
                             stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, f"worker failed:\n{out}"
    assert any("proc 0 OK" in out for _, out in outs)
    assert any("proc 1 OK" in out for _, out in outs)
