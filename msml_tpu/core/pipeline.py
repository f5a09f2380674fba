"""Pipeline parallelism (GPipe-style) over a ``pipe`` mesh axis.

The fifth parallelism family (after data, multi-slice data, class-sharded
PartialFC, and spatial partitioning): a homogeneous stack of blocks is
split across devices — device i holds the parameters of blocks
``[i*L/S, (i+1)*L/S)`` only — and microbatches stream through the stages
with ``lax.ppermute`` shifts inside one ``shard_map``'d ``lax.scan``.
This is the TPU-native pipelining recipe (collective permute over the ICI
ring, static shapes, one compiled program) rather than the
send/recv + scheduler threads a GPU framework would use.

Scope: the inference/eval forward of homogeneous block stacks (same
input/output shape per block — e.g. the 30 identical 14^2 x 256 blocks of
iResNet-100's stage 3, `nn/iresnet.py`; reference
`backbones/frb/iresnet.py:241-363`). MSML's reference configs are at most
100 layers deep, so *training* runs data-parallel (docs/distributed.md);
pipelining exists for the serving/eval side, where it lets a model whose
weights exceed one chip's HBM run without resharding the batch.

Schedule: S stages, M microbatches, T = M + S - 1 ticks. At tick t,
stage 0 feeds microbatch t (while t < M); every stage applies its blocks
to its current activation; activations shift one stage along the ring.
Stage S-1's outputs for ticks >= S-1 are the final microbatch results.
The bubble (S - 1 garbage ticks per stage) is masked by construction:
invalid outputs are simply never read back.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PIPE_AXIS = "pipe"


def make_pipe_mesh(n_stages: int, devices=None) -> Mesh:
    devices = list(jax.devices() if devices is None else devices)
    if n_stages < 1 or len(devices) < n_stages:
        raise ValueError(
            f"need 1 <= n_stages <= {len(devices)} available devices, "
            f"got n_stages={n_stages}")
    return Mesh(np.asarray(devices[:n_stages]), (PIPE_AXIS,))


def stack_block_params(block_params: list):
    """[tree_0, ..., tree_{L-1}] (identical structures) -> one tree whose
    leaves gain a leading L dim — the stackable form pipeline_apply shards
    over the pipe axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *block_params)


def make_pipeline_apply(block_fn: Callable, stacked_params, mesh: Mesh,
                        microbatches: int) -> Callable:
    """Factory for the pipelined forward: shards the stacked block params
    over the ``pipe`` axis ONCE and returns a jitted ``apply(x)`` that
    reuses the compiled executable across calls — the shape a serving loop
    needs (the whole point of pipelining is repeated forwards of a model
    whose weights exceed one chip's HBM; recompiling + re-sharding per
    request would dominate wall-clock).

    block_fn(params_one_block, y) -> y' must preserve y's shape/dtype.
    The block count L must divide by the stage count S; each ``x``'s batch
    must divide by ``microbatches`` (M >= S keeps the bubble fraction at
    (S-1)/(M+S-1)). apply(x) returns exactly ``block_fn`` folded L times
    over x (tested equal)."""
    if PIPE_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no '{PIPE_AXIS}' "
                         f"axis: use make_pipe_mesh")
    n_stages = int(mesh.shape[PIPE_AXIS])
    n_blocks = int(jax.tree.leaves(stacked_params)[0].shape[0])
    if n_blocks % n_stages:
        raise ValueError(f"{n_blocks} blocks not divisible by "
                         f"{n_stages} pipeline stages")
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(PIPE_AXIS), P()),       # my blocks' params; full input
        out_specs=P(PIPE_AXIS))             # per-stage outputs, stacked
    def run(params_mine, xm_all):
        stage = lax.axis_index(PIPE_AXIS)
        ticks = int(xm_all.shape[0]) + n_stages - 1
        n_micro = int(xm_all.shape[0])

        def stage_fwd(y):
            # my L/S consecutive blocks, folded with a scan over their
            # stacked params (same trick the FRB stages use)
            def body(h, p_one):
                return block_fn(p_one, h), None
            y, _ = lax.scan(body, y, params_mine)
            return y

        def tick(carry, t):
            act, outs = carry
            feed = xm_all[jnp.minimum(t, n_micro - 1)]
            y = jnp.where(stage == 0, feed, act)
            y = stage_fwd(y)
            # stage S-1 completes microbatch t-(S-1) at tick t
            out_idx = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
            valid = t >= (n_stages - 1)
            outs = lax.dynamic_update_index_in_dim(
                outs, jnp.where(valid, y, outs[out_idx]), out_idx, 0)
            act = lax.ppermute(y, PIPE_AXIS, perm)
            return (act, outs), None

        # the carry varies per pipe stage from tick 1 on; mark the zero
        # initials as pipe-varying so scan's carry types stay fixed
        outs0 = lax.pcast(jnp.zeros_like(xm_all), (PIPE_AXIS,),
                          to="varying")
        act0 = lax.pcast(jnp.zeros_like(xm_all[0]), (PIPE_AXIS,),
                         to="varying")
        (_, outs), _ = lax.scan(tick, (act0, outs0), jnp.arange(ticks))
        return outs[None]  # (1, M, mb, ...) per stage -> stacked over pipe

    params_sharded = jax.device_put(
        stacked_params, NamedSharding(mesh, P(PIPE_AXIS)))

    @jax.jit
    def _pipelined(params, xm):
        # only the LAST stage's buffer holds real outputs
        outs = run(params, xm)[-1]
        return outs.reshape((xm.shape[0] * xm.shape[1],) + xm.shape[2:])

    def apply(x: jnp.ndarray) -> jnp.ndarray:
        batch = int(x.shape[0])
        if batch % microbatches:
            raise ValueError(f"batch {batch} not divisible by "
                             f"microbatches={microbatches}")
        mb = batch // microbatches
        xm = x.reshape((microbatches, mb) + tuple(x.shape[1:]))
        return _pipelined(params_sharded, xm)

    apply._pipelined = _pipelined  # exposed for cache introspection/tests
    return apply


def pipeline_apply(block_fn: Callable, stacked_params, x: jnp.ndarray,
                   mesh: Mesh, microbatches: int):
    """One-shot convenience wrapper over :func:`make_pipeline_apply` (use
    the factory in loops — it caches the compiled pipeline)."""
    return make_pipeline_apply(block_fn, stacked_params, mesh,
                               microbatches)(x)
