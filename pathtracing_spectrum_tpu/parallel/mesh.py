"""Device-mesh helpers.

The reference is single-process with no distributed backend at all (SURVEY
§2.3 P3); this module is the new framework's multi-chip story: a 1-D
``jax.sharding.Mesh`` over all chips, pixel tiles sharded along it, and
collectives riding ICI. Multi-host initialisation wraps
``jax.distributed.initialize`` (DCN for scene broadcast is handled by jax).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TILE_AXIS = "tiles"


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = TILE_AXIS) -> Mesh:
    """1-D mesh over the given (default: all) devices."""
    import numpy as np
    devs = list(devices) if devices is not None else list(jax.devices())
    return Mesh(np.asarray(devs), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tile_sharded(mesh: Mesh, axis_name: str = TILE_AXIS) -> NamedSharding:
    """Shard the leading (pixel) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (no-op single-host).

    Must run before ANY operation that initialises the XLA backend —
    including importing modules that build jnp constants (the package's
    ``ops`` modules do). Proven end-to-end by tests/test_multihost.py: two
    OS processes form one global mesh and an spp-allreduce render step
    psums across the process boundary, both sides observing the identical
    merged accumulator."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
