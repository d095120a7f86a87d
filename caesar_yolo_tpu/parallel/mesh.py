"""Device-mesh helpers for tile-batch data parallelism.

The reference farms tiles to MPI ranks with a static round-robin
(reference inference.py:992-1162) and ships results as pickled dicts
(:954-978).  TPU-native replacement: a 1D `jax.sharding.Mesh`; tile
batches are sharded on the batch axis, parameters are replicated, and
results come back as fixed-shape arrays — XLA moves data over ICI, no
host pickling.

Multi-host inference is share-nothing BY DESIGN (matching the
reference's MPI ranks): tiles stripe across processes by tid, each
process runs its stripe over a mesh of its OWN local devices
(`local_mesh()`), and the chunked payload allgather reassembles the
catalog everywhere (sfinder._gather_multihost).  A global mesh is NOT
used for tiled inference — each host holds different tiles, so a
global batch axis would require every host to materialize all hosts'
pixels.  Training is the opposite: one global batch, global mesh,
gradients averaged by psum (train/trainer.py).
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


def local_mesh(axis_name: str = TILE_AXIS) -> Mesh:
    """1D mesh over THIS process's addressable devices — the mesh for
    striped multi-host tile inference (see module docstring)."""
    return make_mesh(jax.local_devices(), axis_name)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(TILE_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (idempotent).  With no coordinator this is a
    no-op (single host, or the runtime wires the cluster itself); with
    one, it must run BEFORE any JAX call that initializes the XLA
    backend — do not probe jax.process_count()/jax.devices() first,
    both initialize the backend and make this raise."""
    if coordinator is None:
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        # idempotence: a second call (or a runtime-managed cluster)
        # reports "already initialized"; everything else is a caller
        # error (e.g. backend touched first) and must propagate
        if "already" in str(e).lower():
            return
        raise


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
