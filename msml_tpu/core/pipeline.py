"""Pipeline parallelism (GPipe-style) over a ``pipe`` mesh axis.

The fifth parallelism family (after data, multi-slice data, class-sharded
PartialFC, and spatial partitioning): a homogeneous stack of blocks is
split across devices — device i holds the parameters of blocks
``[i*L/S, (i+1)*L/S)`` only — and microbatches stream through the stages
with ``lax.ppermute`` shifts inside one ``shard_map``'d ``lax.scan``.
This is the TPU-native pipelining recipe (collective permute over the ICI
ring, static shapes, one compiled program) rather than the
send/recv + scheduler threads a GPU framework would use.

Scope: homogeneous block stacks (same input/output shape per block —
e.g. the 30 identical 14^2 x 256 blocks of iResNet-100's stage 3,
`nn/iresnet.py`; reference `backbones/frb/iresnet.py:241-363`): the
inference/eval forward (:func:`make_pipeline_apply`) AND GPipe training
over the stage split (:func:`make_pipeline_train_step`). MSML's reference
configs are at most 100 layers deep, so production training runs
data-parallel (docs/distributed.md); pipelined training exists for
backbones whose weights/activations exceed one chip's HBM.

Training is the same TPU-native recipe run through AD: the forward is a
pure ``lax.scan`` over ticks with ``lax.ppermute`` shifts, so
``jax.value_and_grad`` THROUGH the pipelined forward yields exactly the
reverse pipeline schedule (ppermute's transpose is the inverse-ring
ppermute; the scan's transpose replays ticks in reverse) with per-stage
activation stashing — GPipe's fill-drain fwd + drain-fill bwd and
microbatch gradient accumulation, without hand-writing a backward
schedule or send/recv threads. Parameter gradients land stage-local
(P("pipe")), the SGD update runs shard-locally on each stage's blocks —
the optimizer-state sharding falls out for free.

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


def _make_fwd_body(block_fn: Callable, n_stages: int, perm):
    """The per-stage pipelined forward (runs inside shard_map over
    ``pipe``): ``fwd(params_mine, xm_all) -> (M, mb, ...)`` outputs —
    real values on the LAST stage, bubble garbage elsewhere. Pure scan +
    ppermute, so it is differentiable: AD's transpose is the reverse
    pipeline schedule (see module docstring)."""

    def fwd(params_mine, xm_all):
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
        return outs

    return fwd


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

    fwd_body = _make_fwd_body(block_fn, n_stages, perm)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(PIPE_AXIS), P()),       # my blocks' params; full input
        out_specs=P(PIPE_AXIS))             # per-stage outputs, stacked
    def run(params_mine, xm_all):
        return fwd_body(params_mine, xm_all)[None]
        # (1, M, mb, ...) per stage -> stacked over pipe

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


# ------------------------------------------------- differentiable forward
def make_pipeline_forward(block_fn: Callable, mesh: Mesh, n_blocks: int,
                          microbatches: int) -> Callable:
    """The pipelined stack forward as a DIFFERENTIABLE jit-level function
    ``fwd(stacked_params, xm) -> outs`` with ``xm`` (M, mb, ...) and
    ``outs`` (M, mb, ...) = block_fn folded n_blocks times over each
    microbatch.

    Unlike :func:`make_pipeline_value_and_grad` (loss inside the
    shard_map), this returns the stack OUTPUT, so a caller can compose an
    arbitrary jit-level model around it — stem before, head/loss after —
    and differentiate the whole thing: AD through the shard_map transposes
    the ppermute ring into the reverse pipeline schedule, and the
    stacked-params cotangent lands stage-local (P("pipe")); replicated
    (invariant) inputs like xm or stem parameters get their cross-stage
    cotangent psum inserted by vma-typed AD. This is what cli.train_stack
    builds the real training mode on."""
    if PIPE_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no '{PIPE_AXIS}' "
                         f"axis: use make_pipe_mesh")
    n_stages = int(mesh.shape[PIPE_AXIS])
    if n_blocks % n_stages:
        raise ValueError(f"{n_blocks} blocks not divisible by "
                         f"{n_stages} pipeline stages")
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    fwd_body = _make_fwd_body(block_fn, n_stages, perm)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(PIPE_AXIS), P()),
        out_specs=P(PIPE_AXIS))
    def run(params_mine, xm):
        return fwd_body(params_mine, xm)[None]

    def fwd(stacked_params, xm):
        # only the LAST stage's buffer holds real microbatch outputs; the
        # index-select seeds zero cotangents into the bubble buffers
        return run(stacked_params, xm)[-1]

    return fwd


# --------------------------------------------------------- GPipe training
def make_pipeline_value_and_grad(block_fn: Callable, loss_fn: Callable,
                                 mesh: Mesh, n_blocks: int,
                                 microbatches: int) -> Callable:
    """Pipelined ``value_and_grad``: the GPipe fwd + bwd + microbatch
    gradient accumulation over the stage split, obtained by
    differentiating THROUGH the pipelined forward.

    ``loss_fn(y_mb, target_mb) -> scalar`` is the per-microbatch loss of
    the stack's output (mean semantics: the total is the mean over
    microbatches, so it equals the unpipelined loss of the full batch for
    any batch-mean loss). Returns

        vag(stacked_params, xm, tm) -> (loss, grads)

    with ``xm``/``tm`` shaped (M, mb, ...), ``stacked_params`` leaves
    (L, ...) sharded over ``pipe``, and ``grads`` in the same stacked
    sharded layout — each stage holds exactly its own blocks' gradients
    (the layout the shard-local optimizer update wants). Bit-equal to
    ``jax.value_and_grad`` of the sequential block fold (tested)."""
    if PIPE_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no '{PIPE_AXIS}' "
                         f"axis: use make_pipe_mesh")
    n_stages = int(mesh.shape[PIPE_AXIS])
    if n_blocks % n_stages:
        raise ValueError(f"{n_blocks} blocks not divisible by "
                         f"{n_stages} pipeline stages")
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    fwd_body = _make_fwd_body(block_fn, n_stages, perm)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(PIPE_AXIS), P(), P()),
        out_specs=(P(), P(PIPE_AXIS)))
    def vag(params_mine, xm, tm):
        stage = lax.axis_index(PIPE_AXIS)

        def total_loss(pm):
            outs = fwd_body(pm, xm)                    # (M, mb, ...)
            # per-microbatch loss; only the LAST stage's outputs are real.
            # The where-mask keeps other stages' (finite bubble-garbage)
            # losses out of both the value and the backward seed; psum
            # makes the scalar pipe-invariant so grad's seed is uniform.
            lvals = jax.vmap(loss_fn)(outs, tm)        # (M,)
            mine = jnp.where(stage == n_stages - 1, lvals.mean(), 0.0)
            return lax.psum(mine, PIPE_AXIS)

        return jax.value_and_grad(total_loss)(params_mine)

    def bound(stacked_params, xm, tm):
        return vag(stacked_params, xm, tm)

    return bound


def make_pipeline_train_step(block_fn: Callable, loss_fn: Callable,
                             stacked_params, mesh: Mesh, microbatches: int,
                             lr: float = 0.1, momentum: float = 0.9,
                             weight_decay: float = 0.0) -> tuple:
    """Pipelined SGD training over a homogeneous block stack: returns
    ``(state, step)`` where ``state = (stacked_params, stacked_momentum)``
    lives sharded over ``pipe`` and

        step(state, x, t) -> (state, loss)

    runs one GPipe fwd/bwd (:func:`make_pipeline_value_and_grad`) and a
    STAGE-LOCAL torch-semantics SGD update (g += wd*p; buf = mu*buf + g;
    p -= lr*buf — train/optim.py parity) on each stage's own blocks.
    Equal to data-parallel/single-device training of the same stack up to
    float reassociation (tests/test_pipeline.py). ``x``/``t`` are full
    batches; the batch dim must divide ``microbatches``."""
    n_blocks = int(jax.tree.leaves(stacked_params)[0].shape[0])
    vag = make_pipeline_value_and_grad(block_fn, loss_fn, mesh, n_blocks,
                                       microbatches)
    sharding = NamedSharding(mesh, P(PIPE_AXIS))
    params = jax.device_put(stacked_params, sharding)
    mom = jax.device_put(jax.tree.map(jnp.zeros_like, stacked_params),
                         sharding)

    @jax.jit
    def step(state, x, t):
        p, m = state
        mb = x.shape[0] // microbatches
        xm = x.reshape((microbatches, mb) + tuple(x.shape[1:]))
        tm = t.reshape((microbatches, mb) + tuple(t.shape[1:]))
        loss, grads = vag(p, xm, tm)

        def upd(pl, gl, ml):
            g = gl.astype(jnp.float32) + weight_decay * pl
            buf = momentum * ml + g
            return pl - lr * buf, buf

        new = jax.tree.map(upd, p, grads, m)
        new_p = jax.tree.map(lambda t2: t2[0], new,
                             is_leaf=lambda t2: isinstance(t2, tuple))
        new_m = jax.tree.map(lambda t2: t2[1], new,
                             is_leaf=lambda t2: isinstance(t2, tuple))
        return (new_p, new_m), loss

    return (params, mom), step
