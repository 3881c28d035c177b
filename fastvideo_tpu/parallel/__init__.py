"""Device-mesh management and collectives.

TPU-native replacement for the reference's executor/GroupCoordinator/pynccl
stack (/root/reference/fastvideo/distributed/parallel_state.py:117-884 and
device_communicators/pynccl_wrapper.py). On TPU there are no manual
communicator objects: a single controller drives a ``jax.sharding.Mesh`` and
all collectives are XLA-native (``psum``/``all_to_all``/``all_gather``)
emitted inside ``shard_map``/``pjit``. The GroupCoordinator role collapses to
mesh-axis naming plus the helpers in this package.

Mesh axes (order matters — contiguous ICI neighborhoods go to the
fastest-varying axes):

* ``dp``  — data parallel (batch). Rides DCN across hosts if needed.
* ``sp``  — Ulysses sequence parallel inside one denoising step.
* ``tp``  — tensor parallel (text encoders / very large DiTs).
"""

from fastvideo_tpu.parallel.mesh import (
    MeshConfig,
    get_mesh,
    get_sp_size,
    get_tp_size,
    get_dp_size,
    init_mesh,
    maybe_init_distributed,
    maybe_init_mesh,
    mesh_context,
    destroy_mesh,
    DP_AXIS,
    SP_AXIS,
    TP_AXIS,
)
from fastvideo_tpu.parallel.shard import (
    param_spec,
    shard_state,
    state_specs,
)
from fastvideo_tpu.parallel.ulysses import (
    local_head_parallel_attention,
    ulysses_attention,
    shard_seq,
    unshard_seq,
    pad_to_multiple,
    pad_rope_to,
    pad_tokens_to,
)

__all__ = [
    "param_spec",
    "shard_state",
    "state_specs",
    "local_head_parallel_attention",
    "MeshConfig",
    "init_mesh",
    "maybe_init_distributed",
    "maybe_init_mesh",
    "get_mesh",
    "get_sp_size",
    "get_tp_size",
    "get_dp_size",
    "mesh_context",
    "destroy_mesh",
    "DP_AXIS",
    "SP_AXIS",
    "TP_AXIS",
    "ulysses_attention",
    "shard_seq",
    "unshard_seq",
    "pad_to_multiple",
    "pad_rope_to",
    "pad_tokens_to",
]
