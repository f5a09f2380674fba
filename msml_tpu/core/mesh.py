"""Device mesh setup for SPMD training.

Replaces the reference's NCCL process-group management (`train.py:44-57`) with a
`jax.sharding.Mesh`. One mesh axis, ``data``, serves double duty exactly like the
reference's ranks: the batch is sharded over it (DDP analogue, `train.py:94-99`)
and the PartialFC classifier's class dimension is sharded over it
(`headers/partial_fc.py:34-36`). All collectives (psum / all_gather /
psum_scatter) ride ICI inside a single pjit'd/shard_map'd step.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def local_batch_size(global_batch: int, mesh: Mesh, axis_name: str = DATA_AXIS) -> int:
    n = mesh.shape[axis_name]
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by mesh axis {n}")
    return global_batch // n


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def class_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (class) dim of the PartialFC weight over the data axis."""
    return NamedSharding(mesh, P(axis_name))
