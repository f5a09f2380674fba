"""Pipelined training of deep homogeneous residual stacks — the real
training mode behind the ``pp:N`` strategy token (VERDICT r4 #4).

The GPipe machinery (core/pipeline.py) pipelines a homogeneous block
stack over a ``pipe`` mesh axis. This module turns it into a complete
trainer with the SAME semantics as the flagship train step
(train/train_step.py): per-param LR scales (``optim.build_lr_scales``
rules), global-norm grad clip 5 (reference `train.py:307`), the epoch LR
schedule factor, momentum-SGD with weight decay, and a checkpointable
``TrainState`` (orbax, core/checkpoint.py) whose block leaves live
sharded ``P("pipe")`` — each stage stores only its own blocks' params
and momentum (the memory win that is pipelining's whole point).

Model shape (``StackNet``): stem (3 stride-2 convs + PReLU, jit-level,
replicated) -> L identical pre-norm residual blocks (GroupNorm + conv3x3
+ PReLU twice; pipelined) -> GAP -> fc embedding -> margin softmax head.
GroupNorm, not BatchNorm: running-stats layers are not pipeline-safe
(each microbatch would see different stats in flight — the standard GPipe
boundary); GroupNorm is per-sample, so the pipelined model is EXACTLY the
sequential model. The stem/head run replicated at jit level before/after
the shard_map'd pipeline; their gradients arrive through vma-typed AD's
cross-stage psum (see core/pipeline.make_pipeline_forward).

Use when a stack's params + activations exceed one chip's HBM (e.g.
iresnet-100-scale stage-3 stacks, reference
`backbones/frb/iresnet.py:241-363`, and deeper). For models that fit,
data parallelism wins — see PERF.md "pipeline mode" for the measured
crossover. Parity: tests/test_pipeline.py::test_stack_trainer_matches_
sequential_oracle (30 blocks at 14^2 x 256, the iresnet100-stage-3
shape).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msml_tpu.core.pipeline import (PIPE_AXIS, make_pipe_mesh,
                                    make_pipeline_forward,
                                    stack_block_params)
from msml_tpu.nn.iresnet import PReLU
from msml_tpu.train import optim
from msml_tpu.train.train_step import TrainState


class StackBlock(nn.Module):
    """Pre-norm residual block: GN -> conv3x3 -> PReLU -> GN -> conv3x3,
    + identity. Shape-preserving (the homogeneity the pipeline needs);
    GroupNorm keeps it stateless (pipeline-safe, see module docstring)."""
    planes: int
    groups: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype)(x)
        h = nn.Conv(self.planes, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv1")(h)
        h = PReLU(self.dtype, name="prelu")(h)
        h = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype)(h)
        h = nn.Conv(self.planes, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        return x + h


class StackStem(nn.Module):
    """112^2 x C_in -> 14^2 x planes: three stride-2 convs (jit-level,
    replicated across stages)."""
    planes: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for i, c in enumerate((self.planes // 4, self.planes // 2,
                               self.planes)):
            x = nn.Conv(c, (3, 3), (2, 2), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = PReLU(self.dtype, name=f"prelu{i + 1}")(x)
        return x


class StackHead(nn.Module):
    """GAP -> f32 fc embedding (iresnet.py:232-233 analogue, GN instead
    of the running-stats feature BN)."""
    dim_feature: int = 512

    @nn.compact
    def __call__(self, x):
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))   # GAP
        x = nn.Dense(self.dim_feature, dtype=jnp.float32, name="fc")(x)
        x = nn.LayerNorm(use_scale=False, use_bias=True,
                         name="features")(x)
        return x


def l2n(x, axis=-1, eps=1e-12):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


def init_stack_state(cfg, mesh: Mesh, rng) -> tuple:
    """Init params for stem / L blocks / head / class weight; block leaves
    stacked (L, ...) and sharded P("pipe"); everything else replicated.
    Returns (state, modules) with ``state`` a checkpointable TrainState
    (batch_stats empty — the stack is stateless by design)."""
    planes = int(cfg.get("stack_planes", 256))
    n_blocks = int(cfg.get("stack_blocks", 30))
    dim = int(cfg.get("dim_feature", 512))
    num_classes = int(cfg.num_classes)
    c_in = 1 if cfg.get("is_gray") else 3

    stem = StackStem(planes)
    block = StackBlock(planes)
    head = StackHead(dim)

    k_stem, k_blocks, k_head, k_w = jax.random.split(rng, 4)
    x0 = jnp.zeros((2, 112, 112, c_in), jnp.float32)
    stem_p = stem.init(k_stem, x0)["params"]
    h0 = stem.apply({"params": stem_p}, x0)
    blocks_p = stack_block_params(
        [block.init(k, h0)["params"]
         for k in jax.random.split(k_blocks, n_blocks)])
    head_p = head.init(k_head, h0)["params"]
    cls_w = jax.random.normal(k_w, (num_classes, dim), jnp.float32) * 0.01

    pipe_sh = NamedSharding(mesh, P(PIPE_AXIS))
    repl = NamedSharding(mesh, P())
    params = {
        "stem": jax.device_put(stem_p, repl),
        "blocks": jax.device_put(blocks_p, pipe_sh),
        "head": jax.device_put(head_p, repl),
        "classification": {"weight": jax.device_put(cls_w, repl)},
    }
    momentum = jax.tree.map(
        lambda x: jax.device_put(jnp.zeros_like(x), x.sharding), params)
    state = TrainState(step=jax.device_put(jnp.zeros((), jnp.int32), repl),
                       params=params, batch_stats={}, momentum=momentum)
    return state, (stem, block, head)


def build_stack_lr_scales(params, cfg, world: int = 1):
    """train.py:152-178 rule specialized to the stack tree: uniform
    batch-scaled base LR, 10x on the classification head when pretrained
    (optim.build_lr_scales parity; no frozen/osb/fm groups here)."""
    return optim.build_lr_scales(params, cfg, world)


def make_stack_train_step(cfg, mesh: Mesh, modules, lr_scales,
                          microbatches: int):
    """``step(state, batch, lr_factor, rng) -> (state, metrics)`` — the
    flagship step contract over the pipelined stack: GPipe fwd/bwd via AD
    through the ring (core/pipeline.py), clip-5 global-norm on the FULL
    gradient tree (block grads arrive stage-local-stacked, so the norm is
    a jit-level reduction like every other strategy), margin-CE loss,
    momentum SGD with per-param LR scales and weight decay."""
    stem, block, head = modules
    n_blocks = int(cfg.get("stack_blocks", 30))
    s = float(cfg.header_params[0])
    m = float(cfg.header_params[1])
    clip_norm = float(cfg.get("grad_clip_norm", 5.0))
    wd = float(cfg.get("weight_decay", 5e-4))
    mu = float(cfg.get("momentum", 0.9))

    pipe_fwd = make_pipeline_forward(
        lambda p, h: block.apply({"params": p}, h), mesh, n_blocks,
        microbatches)

    state_sh = None
    repl = NamedSharding(mesh, P())

    def raw_step(state, batch, lr_factor, rng):
        img, label = batch["img"], batch["label"]

        def loss_fn(params):
            h = stem.apply({"params": params["stem"]}, img)
            M = microbatches
            hm = h.reshape((M, h.shape[0] // M) + h.shape[1:])
            outs = pipe_fwd(params["blocks"], hm)
            feats = outs.reshape((h.shape[0],) + outs.shape[2:])
            emb = head.apply({"params": params["head"]}, feats)
            logits = l2n(emb) @ l2n(params["classification"]["weight"]).T
            onehot = jax.nn.one_hot(label, logits.shape[-1],
                                    dtype=logits.dtype)
            logits = s * (logits - m * onehot)       # AMCosFace margin
            logp = jax.nn.log_softmax(logits, -1)
            return -jnp.take_along_axis(logp, label[:, None], 1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads, gnorm = optim.clip_by_global_norm(grads, clip_norm)
        new_params, new_mom = optim.sgd_update(
            state.params, grads, state.momentum, lr_scales, lr_factor,
            wd, mu)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  momentum=new_mom)
        return new_state, {"total_loss": loss, "grad_norm": gnorm}

    _jit = None

    def bound(state, batch, lr_factor, rng):
        nonlocal _jit
        if _jit is None:
            ssh = jax.tree.map(lambda x: x.sharding, state)
            _jit = jax.jit(raw_step, donate_argnums=(0,),
                           in_shardings=(ssh,
                                         jax.tree.map(lambda _: repl,
                                                      batch),
                                         repl, repl),
                           out_shardings=(ssh, {"total_loss": repl,
                                                "grad_norm": repl}))
        return _jit(state, batch, jnp.asarray(lr_factor, jnp.float32),
                    rng)

    return bound


def sequential_stack_step(cfg, modules, lr_scales, microbatches: int):
    """Single-device oracle: the SAME math with the blocks folded by a
    plain lax.scan (no mesh, no pipeline) — the parity reference for
    tests (equal up to float reassociation)."""
    stem, block, head = modules
    s = float(cfg.header_params[0])
    m = float(cfg.header_params[1])
    clip_norm = float(cfg.get("grad_clip_norm", 5.0))
    wd = float(cfg.get("weight_decay", 5e-4))
    mu = float(cfg.get("momentum", 0.9))

    @jax.jit
    def step(state, batch, lr_factor, rng):
        img, label = batch["img"], batch["label"]

        def loss_fn(params):
            h = stem.apply({"params": params["stem"]}, img)
            # fold per microbatch like the pipeline does (bit-comparable
            # reduction order within a microbatch)
            M = microbatches
            hm = h.reshape((M, h.shape[0] // M) + h.shape[1:])

            def fold(hmb):
                def body(carry, p_one):
                    return block.apply({"params": p_one}, carry), None
                out, _ = jax.lax.scan(body, hmb, params["blocks"])
                return out

            feats = jax.vmap(fold)(hm)
            feats = feats.reshape((h.shape[0],) + feats.shape[2:])
            emb = head.apply({"params": params["head"]}, feats)
            logits = l2n(emb) @ l2n(params["classification"]["weight"]).T
            onehot = jax.nn.one_hot(label, logits.shape[-1],
                                    dtype=logits.dtype)
            logits = s * (logits - m * onehot)
            logp = jax.nn.log_softmax(logits, -1)
            return -jnp.take_along_axis(logp, label[:, None], 1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads, gnorm = optim.clip_by_global_norm(grads, clip_norm)
        new_params, new_mom = optim.sgd_update(
            state.params, grads, state.momentum, lr_scales, lr_factor,
            wd, mu)
        return state.replace(step=state.step + 1, params=new_params,
                             momentum=new_mom), \
            {"total_loss": loss, "grad_norm": gnorm}

    return step
