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


def init_tp_train_state(model, cfg, rng, mesh: Mesh):
    """Like train_step.init_train_state, but weights/momentum/batch_stats
    are placed under the TP sharding rules (dense-head path; PartialFC
    stays on the shard_map path with its own class sharding)."""
    from msml_tpu.train.train_step import TrainState
    h = w = 128 if cfg.is_gray else 112
    c = 1 if cfg.is_gray else 3
    x = jnp.zeros((2, h, w, c), jnp.float32)
    label = jnp.zeros((2,), jnp.int32)
    ori = x if cfg.peer_params.get("use_ori") else None
    variables = model.init({"params": rng, "dropout": rng}, x, label, ori,
                           train=True)
    params = shard_params_tp(variables["params"], mesh)
    batch_stats = shard_params_tp(variables.get("batch_stats", {}), mesh)
    momentum = shard_params_tp(optim.init_momentum(variables["params"]),
                               mesh)
    # the step counter must live on the SAME mesh (mixing a single-device
    # sharding into the jit's in_shardings is an error)
    step = jax.device_put(jnp.zeros((), jnp.int32),
                          NamedSharding(mesh, P()))
    return TrainState(step=step, params=params,
                      batch_stats=batch_stats, momentum=momentum)


def make_tp_train_step(model, cfg, mesh: Mesh, lr_scales):
    """GSPMD training step over a ``("data", "model")`` mesh (dense heads).

    Same loss composition as the shard_map step (train/train_step.py:
    CE + lambda1 * consensus + kd_weight * kd + sown recover loss, SGD
    with per-param LR scales, global-norm clip) written over the GLOBAL
    batch — no explicit collectives; XLA inserts the data-axis grad
    reductions and the model-axis block psums. BatchNorm is sync-BN (the
    documented semantic difference from the per-shard shard_map path).

    step(state, batch, lr_factor, rng) -> (state, metrics)
    """
    if MODEL_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no '{MODEL_AXIS}' "
                         f"axis: use make_tp_mesh")
    use_osb = bool(cfg.use_osb)
    use_ori = bool(cfg.peer_params.get("use_ori"))
    lambda1 = float(cfg.lambda1)
    kd_weight = float(cfg.get("kd_loss_weight", 0.0))
    device_light = bool(cfg.get("device_light"))
    dl_gauss = bool(cfg.get("gauss_light", True))
    dl_norm = bool(cfg.use_norm)
    clip_norm = float(cfg.grad_clip_norm)
    wd = float(cfg.weight_decay)
    momentum_coef = float(cfg.momentum)

    from msml_tpu.losses import structure_consensus_loss

    def step_fn(state, batch, lr_factor, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        img, label = batch["img"], batch["label"]
        ori = batch["ori"] if use_ori else None
        if device_light:
            from msml_tpu.kernels.augment import device_input_stage
            img = device_input_stage(img,
                                     jax.random.fold_in(step_rng, 0xD11),
                                     gauss_light=dl_gauss, use_norm=dl_norm)
            if ori is not None:
                ori = device_input_stage(ori, step_rng, gauss_light=False,
                                         use_norm=dl_norm)

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats}
            outs, mutated = model.apply(
                variables, img, label, ori, train=True,
                rngs={"dropout": step_rng},
                mutable=["batch_stats", "losses"])
            head_out, final_seg, kd = outs
            rec_loss = sum(jnp.asarray(v, jnp.float32).sum()
                           for v in jax.tree.leaves(
                               mutated.get("losses", {})))
            logp = jax.nn.log_softmax(head_out.astype(jnp.float32), -1)
            cls_loss = -jnp.take_along_axis(
                logp, label[:, None], 1)[:, 0].mean()
            if use_osb:
                seg_loss = structure_consensus_loss(final_seg, batch["msk"])
            else:
                seg_loss = jnp.float32(0.0)
            kd = jnp.asarray(kd, jnp.float32)
            total = (cls_loss + lambda1 * seg_loss + kd_weight * kd
                     + rec_loss)
            aux = dict(batch_stats=mutated["batch_stats"],
                       cls_loss=cls_loss, seg_loss=seg_loss, kd=kd)
            return total, aux

        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        grads, gnorm = optim.clip_by_global_norm(grads, clip_norm)
        new_params, new_momentum = optim.sgd_update(
            state.params, grads, state.momentum, lr_scales, lr_factor,
            wd, momentum_coef)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=aux["batch_stats"],
                                  momentum=new_momentum)
        metrics = dict(total_loss=total, cls_loss=aux["cls_loss"],
                       seg_loss=aux["seg_loss"], kd=aux["kd"],
                       nll=aux["cls_loss"], grad_norm=gnorm)
        return new_state, metrics

    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    _jit = None

    def bound(state, batch, lr_factor, rng):
        """First call pins the state's shardings as the jit contract, so
        every step preserves the TP layout (no silent resharding)."""
        nonlocal _jit
        if _jit is None:
            state_sh = jax.tree.map(lambda x: x.sharding, state)
            metric_keys = ("total_loss", "cls_loss", "seg_loss", "kd",
                           "nll", "grad_norm")
            _jit = jax.jit(
                step_fn, donate_argnums=(0,),
                in_shardings=(state_sh,
                              jax.tree.map(lambda _: batch_sh, batch),
                              repl, repl),
                out_shardings=(state_sh, {k: repl for k in metric_keys}))
        return _jit(state, batch, jnp.asarray(lr_factor, jnp.float32), rng)

    return bound
