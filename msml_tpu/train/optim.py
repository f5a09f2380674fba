"""Torch-parity SGD with per-group learning rates and global-norm clipping.

Parity targets:
  * the 4 LR groups of `train.py:152-178`: 'osb' params at 0.01*B/512,
    'fm_ops' at 0.1*B/512 and 'classification' at 10*lr*B/512 when pretrained,
    everything else at lr*B/512; frozen 'peer' params get scale 0 (the
    reference freezes them via requires_grad=False).
  * torch.optim.SGD semantics (`train.py:175-178`): g += wd*p;
    buf = mu*buf + g; p -= lr*buf.
  * clip_grad_norm_(max_norm=5) over all trainable params (`train.py:270`),
    applied to raw grads before the momentum update, like the reference's
    unscale -> clip -> step ordering.
  * LambdaLR epoch factor multiplies every group (`train.py:193-196`).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import traverse_util

PyTree = Any


def build_lr_scales(params: PyTree, cfg, world_size: int = 1) -> PyTree:
    """Per-parameter LR (absolute, before the epoch factor), from config.

    Reference `train.py:152-178`: base = lr/512 * batch_size * world_size
    (cfg.batch_size is per-chip, like the reference's per-rank batch).
    """
    batch_world = cfg.batch_size * world_size
    base = cfg.lr / 512.0 * batch_world
    flat = traverse_util.flatten_dict(params)
    scales = {}
    for path in flat:
        name = "/".join(str(p) for p in path)
        if "peer" in name:
            scales[path] = 0.0  # frozen teacher
        elif "osb" in name:
            scales[path] = 0.01 / 512.0 * batch_world
        elif not cfg.pretrained:
            scales[path] = base
        elif "classification" in name:
            scales[path] = 10.0 * base
        elif "fm_op" in name:
            scales[path] = 0.1 / 512.0 * batch_world
        else:
            scales[path] = base
    return traverse_util.unflatten_dict(scales)


def init_momentum(params: PyTree) -> PyTree:
    return jax.tree.map(jnp.zeros_like, params)


def global_norm(tree: PyTree) -> jnp.ndarray:
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in jax.tree.leaves(tree)))


def clip_by_global_norm(grads: PyTree, max_norm: float):
    """torch.nn.utils.clip_grad_norm_ parity: scale all grads by
    max_norm/(norm+1e-6) when norm > max_norm."""
    norm = global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), norm


def sgd_update(params: PyTree, grads: PyTree, momentum: PyTree,
               lr_scales: PyTree, lr_factor: jnp.ndarray,
               weight_decay: float, momentum_coef: float = 0.9):
    """One torch-SGD step. lr_factor is the LambdaLR epoch factor."""

    def upd(p, g, buf, lr):
        if lr == 0.0:
            # frozen group (peer teacher): the reference's SGD never touches
            # requires_grad=False params — without this, weight decay would
            # still accumulate wd*p garbage into the teacher-sized momentum
            # buffer (and rewrite it to HBM) every step. lr_scales leaves
            # are static Python floats, so this is a trace-time branch.
            return p, buf
        g = g.astype(jnp.float32) + weight_decay * p
        buf = momentum_coef * buf + g
        return p - lr_factor * lr * buf, buf

    flat_p = traverse_util.flatten_dict(params)
    flat_g = traverse_util.flatten_dict(grads)
    flat_m = traverse_util.flatten_dict(momentum)
    flat_s = traverse_util.flatten_dict(lr_scales)
    new_p, new_m = {}, {}
    for k in flat_p:
        new_p[k], new_m[k] = upd(flat_p[k], flat_g[k], flat_m[k], flat_s[k])
    return (traverse_util.unflatten_dict(new_p),
            traverse_util.unflatten_dict(new_m))


def pfc_sgd_update(weight: jnp.ndarray, grad: jnp.ndarray,
                   momentum: jnp.ndarray, lr: jnp.ndarray,
                   lr_factor: jnp.ndarray, weight_decay: float,
                   momentum_coef: float = 0.9,
                   sample_index: jnp.ndarray | None = None):
    """SGD for the class-sharded PartialFC weight (reference `opt_pfc`,
    train.py:188-191 + the momentum-buffer swap of partial_fc.py:112-114):
    when sampling, only sampled rows' weight/momentum are touched."""
    g = grad.astype(jnp.float32)
    if sample_index is None:
        g = g + weight_decay * weight
        momentum = momentum_coef * momentum + g
        return weight - lr_factor * lr * momentum, momentum
    rows_w = weight[sample_index]
    rows_g = g[sample_index] + weight_decay * rows_w
    rows_m = momentum_coef * momentum[sample_index] + rows_g
    weight = weight.at[sample_index].set(rows_w - lr_factor * lr * rows_m)
    momentum = momentum.at[sample_index].set(rows_m)
    return weight, momentum


def pfc_sgd_update_rows(weight: jnp.ndarray, rows_grad: jnp.ndarray,
                        momentum: jnp.ndarray, lr: jnp.ndarray,
                        lr_factor: jnp.ndarray, weight_decay: float,
                        momentum_coef: float, sample_index: jnp.ndarray):
    """`pfc_sgd_update` when the gradient is ALREADY the sampled rows'
    gradient (see PartialFC.presample/loss_rows): no dense scatter-add in
    AD and no dense-grad gather here — one sorted-unique gather and one
    sorted-unique scatter per buffer. Bit-identical update to the dense
    path (untouched rows have zero grad there and are not written here)."""
    kw = dict(unique_indices=True, indices_are_sorted=True,
              mode="promise_in_bounds")
    rows_w = weight.at[sample_index].get(**kw)
    rows_g = rows_grad.astype(jnp.float32) + weight_decay * rows_w
    rows_m = momentum_coef * momentum.at[sample_index].get(**kw) + rows_g
    weight = weight.at[sample_index].set(rows_w - lr_factor * lr * rows_m,
                                         **kw)
    momentum = momentum.at[sample_index].set(rows_m, **kw)
    return weight, momentum
