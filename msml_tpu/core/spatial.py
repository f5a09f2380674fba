"""Spatial partitioning (GSPMD) for the eval/serving forward.

A TPU-native latency lever the reference cannot express: shard the image
HEIGHT dimension across chips and let XLA's SPMD partitioner insert the
halo exchanges each conv window needs at the shard seams (the GSPMD
spatial-partitioning recipe used for MLPerf segmentation workloads).
Data parallelism scales *throughput*, but one request still runs on a
single chip; on a ``("data", "spatial")`` mesh a batch-1 request is
computed cooperatively by ``n_spatial`` chips, cutting latency for
serving and for very large inputs. The reference's eval parallelism is
``nn.DataParallel`` over the batch only (`eval/qeval_mxnet.py:162`).

No model changes are needed: the forward is jitted with the image input
sharded ``P("data", "spatial")`` (NHWC) and the weights replicated; every
conv / pool / reshape repartition (e.g. the final 7x7 flatten into the fc)
is compiled to ICI collectives by XLA. Heights that do not divide the
spatial axis are handled by GSPMD's internal padding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msml_tpu.core.mesh import DATA_AXIS

SPATIAL_AXIS = "spatial"


def make_spatial_mesh(n_spatial: int, devices=None) -> Mesh:
    """2-D ``("data", "spatial")`` mesh: the trailing ``n_spatial`` devices
    of each row cooperate on one image. On real hardware the trailing mesh
    dimension is the innermost ICI ring, which is where the per-conv halo
    traffic should live."""
    devices = list(jax.devices() if devices is None else devices)
    if n_spatial < 1 or len(devices) % n_spatial:
        raise ValueError(
            f"{len(devices)} devices not divisible by n_spatial={n_spatial}")
    arr = np.asarray(devices).reshape(-1, n_spatial)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))


def make_spatial_eval_step(model, mesh: Mesh):
    """Jitted feature extraction ``(params, batch_stats, img) -> features``
    with the batch sharded over ``data`` and the image height over
    ``spatial`` (GSPMD halo exchange inside).

    Same pad-and-drop contract as ``train_step.make_eval_step``: any host
    batch size is zero-padded to a multiple of the data axis and the
    padding rows are dropped from the result."""
    if SPATIAL_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no "
                         f"'{SPATIAL_AXIS}' axis: use make_spatial_mesh")
    repl = NamedSharding(mesh, P())
    img_sh = NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))
    out_sh = NamedSharding(mesh, P(DATA_AXIS))

    @partial(jax.jit, in_shardings=(repl, repl, img_sh),
             out_shardings=out_sh)
    def eval_step(params, batch_stats, img):
        feature, _ = model.apply({"params": params,
                                  "batch_stats": batch_stats},
                                 img, train=False)
        return feature

    n_data = int(mesh.shape[DATA_AXIS])

    def bound(params, batch_stats, img):
        img = jnp.asarray(img)
        b = img.shape[0]
        pad = (-b) % n_data
        if pad:
            img = jnp.concatenate(
                [img, jnp.zeros((pad,) + tuple(img.shape[1:]), img.dtype)])
        return eval_step(params, batch_stats, img)[:b]

    return bound


# NOTE — int8 (core/quantize.py) + spatial partitioning do NOT compose
# today: the quantized graph is shape-wise just another traceable function
# of img and its numerics are even sharding-invariant (max-reduction
# scales, exact int32 accumulation), but XLA's SPMD partitioner emits a
# mixed-dtype `pad` when building the halo regions of an s8 convolution
# ("element types of the operands to Pad do not match", hlo verifier,
# post spmd-partitioning) — an XLA limitation, reproduced on the flagship
# eval graph at P("data", "spatial"). cli/serve.py therefore rejects
# --spatial together with --quant.
