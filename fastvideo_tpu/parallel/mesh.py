"""Global device-mesh state.

Replaces the reference's ``init_distributed_environment`` /
``initialize_model_parallel`` (/root/reference/fastvideo/distributed/
parallel_state.py:723,789). Instead of spawning one process per device and
carving NCCL groups, we build one ``jax.sharding.Mesh`` over all addressable
devices and name its axes. Axis sizes play the role of
tp_size/sp_size/world_size in the reference.
"""

from __future__ import annotations

import contextlib
import dataclasses
import threading

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastvideo_tpu.logger import init_logger

logger = init_logger(__name__)

DP_AXIS = "dp"
SP_AXIS = "sp"
TP_AXIS = "tp"

AXIS_ORDER = (DP_AXIS, SP_AXIS, TP_AXIS)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Parallel layout. -1 on dp means "use all remaining devices"."""

    dp_size: int = -1
    sp_size: int = 1
    tp_size: int = 1

    def resolve(self, num_devices: int) -> tuple[int, int, int]:
        sp, tp = self.sp_size, self.tp_size
        dp = self.dp_size
        if dp == -1:
            if num_devices % (sp * tp) != 0:
                raise ValueError(
                    f"num_devices={num_devices} not divisible by "
                    f"sp*tp={sp * tp}")
            dp = num_devices // (sp * tp)
        if dp * sp * tp > num_devices:
            raise ValueError(
                f"dp*sp*tp={dp * sp * tp} > num_devices={num_devices}")
        return dp, sp, tp


class _MeshState(threading.local):
    mesh: Mesh | None = None


_STATE = _MeshState()


def init_mesh(mesh_config: MeshConfig | None = None,
              devices: list | None = None) -> Mesh:
    """Create and install the global mesh.

    ``sp`` is placed innermost (fastest-varying over devices) so the Ulysses
    all-to-all rides adjacent ICI links; ``dp`` is outermost so it can span
    DCN on multi-host deployments without code changes.
    """
    mesh_config = mesh_config or MeshConfig()
    if devices is None:
        devices = jax.devices()
    dp, sp, tp = mesh_config.resolve(len(devices))
    dev_array = np.asarray(devices[:dp * sp * tp]).reshape(dp, sp, tp)
    mesh = Mesh(dev_array, AXIS_ORDER)
    _STATE.mesh = mesh
    logger.info("Initialized mesh dp=%d sp=%d tp=%d over %d devices (%s)", dp,
                sp, tp, len(devices), devices[0].platform)
    return mesh


_DISTRIBUTED_INITIALIZED = False


def maybe_init_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Multi-host runtime init (``jax.distributed.initialize``).

    Role analog of the reference's Ray executor bootstrap
    (/root/reference/fastvideo/worker/ray_distributed_executor.py:52):
    after this, ``jax.devices()`` spans every host and the mesh's
    outermost ``dp`` axis rides DCN with no other code changes.

    Reads ``FASTVIDEO_COORDINATOR_ADDRESS`` / ``FASTVIDEO_NUM_PROCESSES``
    / ``FASTVIDEO_PROCESS_ID`` when args are omitted. No-op (returns
    False) for single-process runs or when already initialized.
    """
    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return True
    import os

    coordinator_address = coordinator_address or os.getenv(
        "FASTVIDEO_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.getenv("FASTVIDEO_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.getenv("FASTVIDEO_PROCESS_ID", "0"))
    if num_processes <= 1 or not coordinator_address:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _DISTRIBUTED_INITIALIZED = True
    logger.info("jax.distributed initialized: process %d/%d via %s",
                process_id, num_processes, coordinator_address)
    return True


def maybe_init_mesh(mesh_config: MeshConfig | None = None) -> Mesh:
    if _STATE.mesh is None:
        maybe_init_distributed()
        return init_mesh(mesh_config)
    return _STATE.mesh


def get_mesh() -> Mesh:
    if _STATE.mesh is None:
        raise RuntimeError("Mesh not initialized; call init_mesh() first "
                           "(VideoGenerator does this automatically).")
    return _STATE.mesh


def destroy_mesh() -> None:
    _STATE.mesh = None


@contextlib.contextmanager
def mesh_context(mesh: Mesh):
    """Temporarily install ``mesh`` as the global mesh.

    Only library-level state: sharding helpers use explicit
    ``NamedSharding(mesh, ...)`` so no jax-global mesh is required (and the
    context is safe to hold across jit tracing).
    """
    prev = _STATE.mesh
    _STATE.mesh = mesh
    try:
        yield mesh
    finally:
        _STATE.mesh = prev


def get_dp_size() -> int:
    return get_mesh().shape[DP_AXIS]


def get_sp_size() -> int:
    mesh = _STATE.mesh
    return 1 if mesh is None else mesh.shape[SP_AXIS]


def get_tp_size() -> int:
    mesh = _STATE.mesh
    return 1 if mesh is None else mesh.shape[TP_AXIS]


def sharding(*spec) -> NamedSharding:
    """NamedSharding over the global mesh for the given PartitionSpec args."""
    return NamedSharding(get_mesh(), P(*spec))


def replicated_sharding() -> NamedSharding:
    return NamedSharding(get_mesh(), P())
