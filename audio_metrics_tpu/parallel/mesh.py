"""Device mesh helpers.

The reference's multi-device backend is a host-side free-GPU queue with full
model replicas (util/gpu_parallel.py:20-118).  On TPU the idiomatic
equivalent is SPMD: one jitted program, batch axis sharded over a
``jax.sharding.Mesh``, per-chip partial statistics merged with XLA
collectives.  The free-device queue, replica cache and thread pool all
disappear — replication of the (identical) program is free.

Meshes are 1-D data-parallel by default.  For pod-scale evaluation across
multiple ICI slices connected over DCN, ``make_mesh(dcn_slices=N)`` builds a
2-D ``("dcn", "data")`` mesh whose minor axis enumerates the chips inside a
slice (ICI neighbours) and whose major axis enumerates slices: the batch
shards over BOTH axes, and because this workload's only cross-chip traffic
is the per-chip moment/metric partials (a few KB each, merged on host or
with tiny collectives), nothing bandwidth-hungry ever crosses DCN — the
scaling-book recipe of keeping the fat axes on ICI holds trivially.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "batch_axes",
    "DATA_AXIS",
    "DCN_AXIS",
]

DATA_AXIS = "data"
DCN_AXIS = "dcn"


def make_mesh(device_indices=None, devices=None, dcn_slices=None) -> Mesh:
    """Build a data-parallel mesh.

    ``device_indices`` mirrors the reference's constructor kwarg
    (audio_metrics.py:32): ``None`` means all local devices; a list selects a
    subset by index into ``jax.devices()``.

    ``dcn_slices``: when > 1, build a 2-D ``("dcn", "data")`` mesh with that
    many slice rows.  Device order inside each row follows
    ``jax.experimental.mesh_utils.create_hybrid_device_mesh`` (slice-aware on
    real multi-slice TPU topologies — chips of one slice stay in one row so
    the minor mesh axis rides ICI); on backends without slice topology
    attributes (CPU test meshes) it falls back to a plain row-major reshape.
    """
    if devices is None:
        all_devices = jax.devices()
        if device_indices is None:
            devices = all_devices
        else:
            devices = [all_devices[i] for i in device_indices]
    if not devices:
        raise RuntimeError("No devices available for mesh construction")
    if dcn_slices and int(dcn_slices) > 1:
        dcn_slices = int(dcn_slices)
        if len(devices) % dcn_slices:
            raise ValueError(
                f"{len(devices)} devices do not divide into "
                f"{dcn_slices} DCN slices"
            )
        per_slice = len(devices) // dcn_slices
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_hybrid_device_mesh(
                (1, per_slice), (dcn_slices, 1), devices=devices
            )
        except Exception:  # no slice_index attribute (CPU / single-slice)
            arr = np.array(devices).reshape(dcn_slices, per_slice)
        return Mesh(arr, (DCN_AXIS, DATA_AXIS))
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_axes(mesh: Mesh) -> tuple[str, ...]:
    """All mesh axis names, as the compound axis the batch shards over.

    Usable directly as a PartitionSpec dimension entry, an axis_name for
    ``jax.lax.axis_index`` (linear index, major axis slowest) and for
    ``jax.lax.pcast`` — a 1-D mesh degenerates to its single name.
    """
    return tuple(mesh.axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over every mesh axis."""
    return NamedSharding(mesh, P(batch_axes(mesh)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
