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
