"""Device mesh helpers.

The reference's multi-device backend is a host-side free-GPU queue with full
model replicas (util/gpu_parallel.py:20-118).  On TPU the idiomatic
equivalent is SPMD: one jitted program, batch axis sharded over a 1-D
``jax.sharding.Mesh``, per-chip partial statistics merged with XLA
collectives.  The free-device queue, replica cache and thread pool all
disappear — replication of the (identical) program is free.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "DATA_AXIS"]

DATA_AXIS = "data"


def make_mesh(device_indices=None, devices=None) -> Mesh:
    """Build a 1-D data-parallel mesh.

    ``device_indices`` mirrors the reference's constructor kwarg
    (audio_metrics.py:32): ``None`` means all local devices; a list selects a
    subset by index into ``jax.devices()``.
    """
    if devices is None:
        all_devices = jax.devices()
        if device_indices is None:
            devices = all_devices
        else:
            devices = [all_devices[i] for i in device_indices]
    if not devices:
        raise RuntimeError("No devices available for mesh construction")
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
