"""FSDP / ZeRO-style parameter + optimizer-state sharding.

The seventh parallelism family (after data, multi-slice data, class-sharded
PartialFC, spatial, pipeline, and tensor parallelism): every large weight
leaf — and its SGD momentum buffer — is sharded over the ``data`` axis, so
per-chip parameter/optimizer HBM shrinks ~1/N while the batch stays
data-parallel. XLA's SPMD partitioner inserts the all-gathers that
materialize each weight where it is used and keeps the *update* sharded
(the ZeRO recipe: grads reduce-scatter onto the owning shard, the SGD
update and momentum write happen shard-locally). The reference has nothing
comparable — its optimizer state is fully replicated per GPU rank
(`train.py:152-191`); the closest analogue is PartialFC's per-rank softmax
weight shard (`headers/partial_fc.py:34-59`), which this generalizes to
the whole model.

Like the other GSPMD families this is hint-based: :func:`fsdp_specs` pins
a ``P(..., "data", ...)`` spec on the largest divisible dimension of every
leaf above ``min_size`` elements (1-D BN/PReLU leaves and other small
tensors stay replicated — gathering them costs more latency than the bytes
saved). Any assignment is semantics-preserving; the train step is the
shared global-batch step (core/gspmd.py), so FSDP training equals the
replicated GSPMD step bit-for-bit up to float reassociation
(tests/test_fsdp.py) and is sync-BN like the TP path.

For MSML-scale models (~24 M params) FSDP is about headroom, not need —
it is what lets the same train step scale to backbones whose optimizer
state would not fit replicated (the iresnet100 + 93k-class head config
already saves ~2x head + momentum HBM per chip at N=8).

Use ``make_mesh()`` (the plain data mesh) -> ``init_fsdp_train_state`` ->
``make_fsdp_train_step``.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msml_tpu.core.mesh import DATA_AXIS
from msml_tpu.train import optim

# Leaves with fewer than 4096 ELEMENTS (8 KiB at bf16, 16 KiB at f32)
# stay replicated: all-gathers that small are latency-bound, and BN
# scale/bias/stats leaves dominate the leaf *count* while holding <0.5%
# of the bytes.
MIN_SHARD_SIZE = 4096


def _leaf_spec(leaf, n_shard: int, min_size: int = MIN_SHARD_SIZE) -> P:
    shape = tuple(getattr(leaf, "shape", ()) or ())
    if not shape or math.prod(shape) < min_size:
        return P()
    # largest dimension divisible by the axis size wins; ties -> last
    # occurrence (conv kernels are HWIO: prefer sharding channels, never
    # the 3x3 spatial dims, which a size tie would otherwise pick)
    best_dim, best = -1, 0
    for d, s in enumerate(shape):
        if s % n_shard == 0 and s >= best:
            best_dim, best = d, s
    if best_dim < 0:
        return P()
    spec = [None] * len(shape)
    spec[best_dim] = DATA_AXIS
    return P(*spec)


def fsdp_specs(tree: Any, n_shard: int, min_size: int = MIN_SHARD_SIZE):
    """PartitionSpec pytree: shard the largest divisible dim of every
    leaf with >= min_size elements over ``data``; replicate the rest."""
    if n_shard <= 1:
        return jax.tree.map(lambda _: P(), tree)
    return jax.tree.map(lambda v: _leaf_spec(v, n_shard, min_size), tree)


def fsdp_shardings(tree: Any, mesh: Mesh, min_size: int = MIN_SHARD_SIZE):
    """NamedSharding pytree from :func:`fsdp_specs` for this mesh."""
    n_shard = int(mesh.shape[DATA_AXIS])
    return jax.tree.map(lambda s: NamedSharding(mesh, s),
                        fsdp_specs(tree, n_shard, min_size),
                        is_leaf=lambda x: isinstance(x, P))


def shard_params_fsdp(tree: Any, mesh: Mesh,
                      min_size: int = MIN_SHARD_SIZE):
    """Place a host/replicated tree onto the mesh under the FSDP rules."""
    return jax.device_put(tree, fsdp_shardings(tree, mesh, min_size))


def init_fsdp_train_state(model, cfg, rng, mesh: Mesh):
    """Like train_step.init_train_state, but params and momentum are
    sharded over ``data`` (ZeRO); batch_stats leaves are 1-D and stay
    replicated via the min-size gate."""
    from msml_tpu.train.train_step import TrainState
    h = w = 128 if cfg.is_gray else 112
    c = 1 if cfg.is_gray else 3
    x = jnp.zeros((2, h, w, c), jnp.float32)
    label = jnp.zeros((2,), jnp.int32)
    ori = x if cfg.peer_params.get("use_ori") else None
    variables = model.init({"params": rng, "dropout": rng}, x, label, ori,
                           train=True)
    params = shard_params_fsdp(variables["params"], mesh)
    batch_stats = shard_params_fsdp(variables.get("batch_stats", {}), mesh)
    momentum = shard_params_fsdp(optim.init_momentum(variables["params"]),
                                 mesh)
    step = jax.device_put(jnp.zeros((), jnp.int32),
                          NamedSharding(mesh, P()))
    return TrainState(step=step, params=params,
                      batch_stats=batch_stats, momentum=momentum)


def make_fsdp_train_step(model, cfg, mesh: Mesh, lr_scales,
                         scan_steps: int = 1, scan_unroll: int = 2):
    """The shared GSPMD global-batch step (core/gspmd.py) jitted with the
    FSDP state layout pinned: weights/momentum stay ``data``-sharded
    across steps, batch sharded over ``data``, sync-BN semantics.

    step(state, batch, lr_factor, rng) -> (state, metrics)

    For FSDP composed with PartialFC / multi-slice meshes use the
    shard_map path instead (``make_train_step(..., fsdp=True)`` via
    core/parallelism.py) — this GSPMD step shards the batch as
    ``P("data")`` only and would silently replicate it across any extra
    mesh axis, so reject such meshes outright."""
    if tuple(mesh.axis_names) != (DATA_AXIS,):
        raise ValueError(
            f"make_fsdp_train_step needs a 1-D ('{DATA_AXIS}',) mesh, got "
            f"{mesh.axis_names}; multi-slice FSDP runs on the shard_map "
            f"path (strategy 'fsdp', core/parallelism.py), TP+FSDP via "
            f"make_tp_fsdp_train_step")
    from msml_tpu.core.gspmd import (make_global_batch_step_fn,
                                     pin_first_call_jit)
    return pin_first_call_jit(
        make_global_batch_step_fn(model, cfg, lr_scales), mesh,
        scan_steps=scan_steps, scan_unroll=scan_unroll)


def sharded_fraction(tree: Any) -> float:
    """Fraction of the tree's bytes whose leaves are actually sharded
    (diagnostic; 1.0 = every byte sharded). Each leaf is weighted by
    elements * itemsize so mixed bf16/f32 trees report true bytes."""
    total = sharded = 0
    for leaf in jax.tree.leaves(tree):
        n = math.prod(leaf.shape) if leaf.shape else 1
        n *= getattr(getattr(leaf, "dtype", None), "itemsize", 1)
        total += n
        sh = getattr(leaf, "sharding", None)
        if sh is not None and not sh.is_fully_replicated:
            sharded += n
    return sharded / max(total, 1)
