"""Device-mesh helpers for tile-batch data parallelism.

The reference farms tiles to MPI ranks with a static round-robin
(reference inference.py:992-1162) and ships results as pickled dicts
(:954-978).  TPU-native replacement: a 1D `jax.sharding.Mesh` over all
chips; tile batches are sharded on the batch axis, parameters are
replicated, and results come back as fixed-shape arrays — XLA moves data
over ICI, no host pickling.

Multi-host: `initialize_distributed()` wires `jax.distributed` so every
host sees the global mesh; each host feeds its addressable shard of the
tile batch.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TILE_AXIS = "tiles"


def make_mesh(devices=None, axis_name: str = TILE_AXIS) -> Mesh:
    """1D mesh over the given (default: all) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(TILE_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (idempotent).  On single-host TPU or CPU this
    is a no-op; on multi-host pods, args may come from the environment."""
    if jax.process_count() > 1:
        return  # already initialized by the runtime
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
