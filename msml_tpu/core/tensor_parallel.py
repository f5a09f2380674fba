"""Tensor (model) parallelism for the backbone and classification head.

The sixth parallelism family (after data, multi-slice data, class-sharded
PartialFC, spatial partitioning, and pipeline parallelism): weights are
sharded over a ``model`` mesh axis and XLA's SPMD partitioner inserts the
collectives. The reference has nothing comparable — its only intra-model
parallelism is PartialFC's manual class sharding (`headers/partial_fc.py`).

The sharding rules are the Megatron column/row pattern mapped onto the
iResNet BN-first residual block (``nn/iresnet.py::IBasicBlock``; reference
`backbones/frb/iresnet.py:38-67`):

  bn1 -> conv1 -> bn2 -> prelu -> conv2 -> bn3 (+ identity)
          O-shard   C-shard  C-shard  I-shard

``conv1`` shards output channels ("column parallel"), so the block's
internal activations are channel-sharded with NO communication through
bn2/prelu; ``conv2`` shards input channels ("row parallel"), whose
contraction XLA completes with one psum per block. bn1/bn3/downsample and
the block boundaries stay replicated, so the residual sum needs no
resharding. The classification head's ``(num_classes, dim)`` weight shards
over classes — for a 93k-class dense head that is 48 MB of f32 per chip
recovered, the same tensor PartialFC shards on the shard_map path.

Everything here is GSPMD: the specs below are *hints pinned on the
weights*; any assignment is semantics-preserving, XLA owns the collective
placement (the same recipe as core/spatial.py). Because the train step is
jitted over the global batch (no shard_map), BatchNorm reduces over the
GLOBAL batch — i.e. the TP step is sync-BN, a documented difference from
the shard_map path, which mirrors the reference's per-rank DDP BN. The
step is therefore mesh-shape-invariant: (data=8, model=1) equals
(data=4, model=2) equals a single device bit-for-bit up to float
reassociation (tested in tests/test_tensor_parallel.py).

Use ``make_tp_mesh(n_model)`` -> ``init_tp_train_state`` ->
``make_tp_train_step`` for training (dense heads; PartialFC keeps its own
class sharding on the shard_map path), and ``make_tp_eval_step`` for a
weight-sharded serving forward.
"""

from __future__ import annotations

import functools
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msml_tpu.core.mesh import DATA_AXIS
from msml_tpu.train import optim

MODEL_AXIS = "model"

# keys that identify an IBasicBlock-shaped subtree (present in both the
# params tree and the batch_stats tree)
_BLOCK_KEYS = frozenset({"bn1", "bn2", "bn3"})


def make_tp_mesh(n_model: int, devices=None) -> Mesh:
    """2-D ``("data", "model")`` mesh: consecutive groups of ``n_model``
    devices cooperate on one batch shard. The model axis is the trailing
    (innermost-ICI) dimension, where the per-block psum traffic lives."""
    devices = list(jax.devices() if devices is None else devices)
    if n_model < 1 or len(devices) % n_model:
        raise ValueError(
            f"{len(devices)} devices not divisible by n_model={n_model}")
    arr = np.asarray(devices).reshape(-1, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _block_planes(block: Mapping) -> Optional[int]:
    """The block's channel width, from whichever tree we are walking."""
    conv1 = block.get("conv1")
    if isinstance(conv1, Mapping) and hasattr(conv1.get("kernel"), "shape"):
        return int(conv1["kernel"].shape[-1])
    bn2 = block.get("bn2")
    if isinstance(bn2, Mapping):
        for leaf in bn2.values():
            if hasattr(leaf, "shape") and getattr(leaf, "ndim", 0) == 1:
                return int(leaf.shape[0])
    return None


def _block_specs(block: Mapping, n_model: int):
    """Column/row specs for one residual block (replicated when the width
    does not divide the model axis — all five pieces must agree)."""
    planes = _block_planes(block)
    if planes is None or planes % n_model:
        return jax.tree.map(lambda _: P(), dict(block))
    out = {}
    for k, sub in block.items():
        if k == "conv1":
            out[k] = jax.tree.map(
                lambda v: P(None, None, None, MODEL_AXIS)
                if getattr(v, "ndim", 0) == 4 else P(), sub)
        elif k == "conv2":
            out[k] = jax.tree.map(
                lambda v: P(None, None, MODEL_AXIS, None)
                if getattr(v, "ndim", 0) == 4 else P(), sub)
        elif k in ("bn2", "prelu"):
            out[k] = jax.tree.map(
                lambda v: P(MODEL_AXIS)
                if getattr(v, "ndim", 0) == 1 and v.shape[0] == planes
                else P(), sub)
        else:  # bn1, bn3, downsample_*: replicated (block boundaries)
            out[k] = jax.tree.map(lambda _: P(), sub)
    return out


def _head_specs(head: Mapping, n_model: int):
    """Class-shard the dense classification head's (num_classes, dim)
    weight (and SoftmaxHead's bias) when the class count divides."""
    out = {}
    for k, v in head.items():
        if (k == "weight" and getattr(v, "ndim", 0) == 2
                and v.shape[0] % n_model == 0):
            out[k] = P(MODEL_AXIS, None)
        elif (k == "bias" and getattr(v, "ndim", 0) == 1
                and v.shape[0] % n_model == 0):
            out[k] = P(MODEL_AXIS)
        else:
            out[k] = jax.tree.map(lambda _: P(), v)
    return out


def tp_specs(tree: Any, n_model: int):
    """PartitionSpec pytree for a params or batch_stats tree: residual
    blocks get the column/row pattern, the classification head class-shards,
    everything else stays replicated. Any subtree shaped like a block is
    treated as one — GSPMD makes every assignment semantics-preserving, so
    a false positive costs at most communication, never correctness."""
    if n_model <= 1:
        return jax.tree.map(lambda _: P(), tree)

    def walk(node, name=""):
        if not isinstance(node, Mapping):
            return jax.tree.map(lambda _: P(), node)
        keys = set(node.keys())
        if _BLOCK_KEYS <= keys:
            return _block_specs(node, n_model)
        out = {}
        for k, sub in node.items():
            if k == "classification" and isinstance(sub, Mapping):
                out[k] = _head_specs(sub, n_model)
            else:
                out[k] = walk(sub, k)
        return out

    return walk(tree)


def tp_shardings(tree: Any, mesh: Mesh):
    """NamedSharding pytree from :func:`tp_specs` for this mesh."""
    n_model = int(mesh.shape[MODEL_AXIS])
    return jax.tree.map(lambda s: NamedSharding(mesh, s),
                        tp_specs(tree, n_model),
                        is_leaf=lambda x: isinstance(x, P))


def tp_fsdp_specs(tree: Any, n_model: int, n_data: int):
    """TP x FSDP composition (both GSPMD hint families on one
    ``("data", "model")`` mesh): residual blocks / the head keep the
    Megatron column-row/class sharding over ``model``; every leaf TP
    leaves fully replicated (stems, BN-adjacent convs, fc, OSB/U-Net, FM
    towers, the peer teacher) is ZeRO-sharded over ``data`` by the
    core/fsdp.py rules instead. The two families touch disjoint leaves,
    so the composition is a per-leaf merge — and, as everywhere in the
    GSPMD recipe, any assignment is semantics-preserving; the train step
    stays the shared global-batch step."""
    from flax import traverse_util

    from msml_tpu.core.fsdp import _leaf_spec
    tp = tp_specs(tree, n_model)
    flat_t = traverse_util.flatten_dict(tree)
    flat_s = traverse_util.flatten_dict(tp)
    out = {}
    for k, leaf in flat_t.items():
        spec = flat_s[k]
        if n_data > 1 and not any(ax is not None for ax in spec):
            spec = _leaf_spec(leaf, n_data)  # P() again if nothing divides
        out[k] = spec
    return traverse_util.unflatten_dict(out)


def tp_fsdp_shardings(tree: Any, mesh: Mesh):
    """NamedSharding pytree from :func:`tp_fsdp_specs` for this mesh."""
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        tp_fsdp_specs(tree, int(mesh.shape[MODEL_AXIS]),
                      int(mesh.shape[DATA_AXIS])),
        is_leaf=lambda x: isinstance(x, P))


def shard_params_tp(tree: Any, mesh: Mesh):
    """Place a host/replicated tree onto the mesh under the TP rules."""
    return jax.device_put(tree, tp_shardings(tree, mesh))


def make_tp_eval_step(model, params, batch_stats, mesh: Mesh):
    """Weight-sharded serving forward: ``bound(img) -> features`` with the
    weights column/row-sharded over ``model`` (placed once, reused across
    calls) and the batch sharded over ``data``. Pad-and-drop contract like
    train_step.make_eval_step."""
    if MODEL_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no '{MODEL_AXIS}' "
                         f"axis: use make_tp_mesh")
    p_sh = tp_shardings(params, mesh)
    bs_sh = tp_shardings(batch_stats, mesh)
    params = jax.device_put(params, p_sh)
    batch_stats = jax.device_put(batch_stats, bs_sh)
    img_sh = NamedSharding(mesh, P(DATA_AXIS))
    out_sh = NamedSharding(mesh, P(DATA_AXIS))

    @functools.partial(jax.jit, in_shardings=(p_sh, bs_sh, img_sh),
                       out_shardings=out_sh)
    def eval_step(p, bs, img):
        feature, _ = model.apply({"params": p, "batch_stats": bs},
                                 img, train=False)
        return feature

    n_data = int(mesh.shape[DATA_AXIS])

    def bound(img):
        img = jnp.asarray(img)
        b = img.shape[0]
        pad = (-b) % n_data
        if pad:
            img = jnp.concatenate(
                [img, jnp.zeros((pad,) + tuple(img.shape[1:]), img.dtype)])
        return eval_step(params, batch_stats, img)[:b]

    return bound


def init_tp_train_state(model, cfg, rng, mesh: Mesh, fsdp: bool = False):
    """Like train_step.init_train_state, but weights/momentum/batch_stats
    are placed under the TP sharding rules (dense-head path; PartialFC
    stays on the shard_map path with its own class sharding). With
    ``fsdp=True``, TP-replicated leaves are additionally ZeRO-sharded over
    ``data`` (:func:`tp_fsdp_specs`)."""
    from msml_tpu.train.train_step import TrainState
    place = ((lambda t: jax.device_put(t, tp_fsdp_shardings(t, mesh)))
             if fsdp else (lambda t: shard_params_tp(t, mesh)))
    h = w = 128 if cfg.is_gray else 112
    c = 1 if cfg.is_gray else 3
    x = jnp.zeros((2, h, w, c), jnp.float32)
    label = jnp.zeros((2,), jnp.int32)
    ori = x if cfg.peer_params.get("use_ori") else None
    variables = model.init({"params": rng, "dropout": rng}, x, label, ori,
                           train=True)
    params = place(variables["params"])
    batch_stats = place(variables.get("batch_stats", {}))
    momentum = place(optim.init_momentum(variables["params"]))
    # the step counter must live on the SAME mesh (mixing a single-device
    # sharding into the jit's in_shardings is an error)
    step = jax.device_put(jnp.zeros((), jnp.int32),
                          NamedSharding(mesh, P()))
    return TrainState(step=step, params=params,
                      batch_stats=batch_stats, momentum=momentum)


def make_tp_train_step(model, cfg, mesh: Mesh, lr_scales,
                       scan_steps: int = 1, scan_unroll: int = 2):
    """GSPMD training step over a ``("data", "model")`` mesh (dense heads).

    The step math is the shared GSPMD global-batch step
    (core/gspmd.py: same loss composition as the shard_map step) — no
    explicit collectives; XLA inserts the data-axis grad reductions and
    the model-axis block psums. BatchNorm is sync-BN (the documented
    semantic difference from the per-shard shard_map path). The state's
    own shardings are pinned on the first call, so the same step serves
    plain TP and TP+FSDP layouts (init_tp_train_state(fsdp=True)).

    step(state, batch, lr_factor, rng) -> (state, metrics)
    """
    if MODEL_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no '{MODEL_AXIS}' "
                         f"axis: use make_tp_mesh")
    from msml_tpu.core.gspmd import (make_global_batch_step_fn,
                                     pin_first_call_jit)
    return pin_first_call_jit(
        make_global_batch_step_fn(model, cfg, lr_scales), mesh,
        scan_steps=scan_steps, scan_unroll=scan_unroll)
