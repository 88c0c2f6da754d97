"""Device-mesh helpers.

The reference distributes work as N independent processes polling a SQLite file
(SURVEY 2, parallelism strategy 1) or an MPI master-worker loop (strategy 2).
The TPU-native equivalent is SPMD over a 1-D device mesh on the *particle* axis:
every particle-indexed array is sharded on axis 0, collectives (psum for global
moments/Gram matrices, all_gather for global top-k) ride ICI, and dynamic load
balancing is unnecessary because vectorized simulators are statically balanced.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PARTICLE_AXIS = "particles"


def particle_mesh(devices=None) -> Mesh:
    """A 1-D mesh over all (or the given) devices, axis name 'particles'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (PARTICLE_AXIS,))


def particle_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [N, ...] particle-major arrays."""
    return NamedSharding(mesh, P(PARTICLE_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Multi-host initialization (replaces the reference's MPI_Init): call once
    per host before building the mesh; jax.distributed wires the hosts and
    jax.devices() then spans the whole slice/pod. No-op if already initialized.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise
