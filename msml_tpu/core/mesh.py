"""Device mesh setup for SPMD training.

Replaces the reference's NCCL process-group management (`train.py:44-57`) with a
`jax.sharding.Mesh`. One mesh axis, ``data``, serves double duty exactly like the
reference's ranks: the batch is sharded over it (DDP analogue, `train.py:94-99`)
and the PartialFC classifier's class dimension is sharded over it
(`headers/partial_fc.py:34-36`). All collectives (psum / all_gather /
psum_scatter) ride ICI inside a single pjit'd/shard_map'd step.

Multi-slice (DCN) topology: `make_mesh(num_slices=S)` builds a 2-D mesh
``("slice", "data")`` with the data axis INSIDE a slice. The batch is
sharded over both axes (plain data parallelism across the whole pod
aggregate), but the PartialFC class shard — whose collectives move
per-step feature/logit traffic (all_gather + psum + the AD
reduce_scatter) — lives on the inner ``data`` axis only, so that traffic
rides ICI; the only cross-slice (DCN) communication is the once-per-step
gradient reduction, exactly the layout the scaling playbook prescribes
(collectives ride ICI, not DCN). The reference has no multi-node story at
all (single-host NCCL rendezvous, `train.py:54`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SLICE_AXIS = "slice"


def make_mesh(devices=None, axis_name: str = DATA_AXIS,
              num_slices: int = 1) -> Mesh:
    """1-D mesh over all (or the given) devices; with ``num_slices > 1``,
    a 2-D ("slice", "data") mesh whose data axis is intra-slice.

    Devices are grouped by their hardware ``slice_index`` when the runtime
    exposes one (real multi-slice TPU), so the inner axis truly maps to
    ICI; otherwise (CPU meshes, tests) the given order is split evenly."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if num_slices == 0:  # auto: infer from the hardware topology
        slice_ids = {getattr(d, "slice_index", None) for d in devices}
        num_slices = len(slice_ids) if None not in slice_ids else 1
    if num_slices <= 1:
        return Mesh(np.asarray(devices), (axis_name,))
    if len(devices) % num_slices:
        raise ValueError(f"{len(devices)} devices not divisible by "
                         f"num_slices={num_slices}")
    arr = np.asarray(devices).reshape(num_slices, -1)
    if all(getattr(d, "slice_index", None) is not None for d in devices):
        devices = sorted(devices, key=lambda d: (d.slice_index, d.id))
        arr = np.asarray(devices).reshape(num_slices, -1)
        # each mesh row must be a single hardware slice — otherwise the
        # "data" axis (which carries PartialFC's per-step feature/logit
        # collectives) silently spans a DCN boundary and the whole point
        # of the layout is lost
        for row in arr:
            row_slices = {d.slice_index for d in row}
            if len(row_slices) != 1:
                n_hw = len({d.slice_index for d in devices})
                raise ValueError(
                    f"num_slices={num_slices} does not match the hardware "
                    f"topology ({n_hw} slices over {len(devices)} devices):"
                    f" a mesh row would mix slices {sorted(row_slices)} — "
                    f"its 'data' axis would cross DCN. Use num_slices=0 "
                    f"(auto) or num_slices={n_hw}.")
    return Mesh(arr, (SLICE_AXIS, axis_name))


def mesh_world(mesh: Mesh) -> int:
    """Total device count (the reference's world_size, train.py:47)."""
    return int(mesh.devices.size)


# mesh axes that never carry the batch dimension: "model" replicates the
# batch within a TP group (core/tensor_parallel.py), "spatial"/"pipe" carry
# image rows / pipeline stages (core/spatial.py, core/pipeline.py)
NON_BATCH_AXES = ("model", "spatial", "pipe")


def batch_axes(mesh: Mesh) -> Tuple[str, ...]:
    """Mesh axes the batch dimension is sharded over (every axis except
    the known non-batch ones)."""
    return tuple(a for a in mesh.axis_names if a not in NON_BATCH_AXES)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    """Per-device batch: the batch dim shards over the batch axes only
    (``batch_axes``) — on a (data, model) TP mesh the batch is replicated
    within a TP group, so only the data axis divides it."""
    import math
    n = math.prod(int(mesh.shape[a]) for a in batch_axes(mesh)) or 1
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"batch-axis product {n}")
    return global_batch // n


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over every mesh axis."""
    return NamedSharding(mesh, P(batch_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def class_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (class) dim of the PartialFC weight over the data
    axis ONLY — on a multi-slice mesh the shard is replicated across
    slices, keeping the per-step feature/logit collectives on ICI."""
    return NamedSharding(mesh, P(axis_name))
