"""The SPMD training step.

Maps the reference hot loop (`train.py:240-328`) onto a single
`jax.shard_map`'d, jitted function over a 1-D device mesh:

  reference (DDP/NCCL)                       here (ICI collectives)
  -----------------------------------------  ------------------------------
  DistributedSampler batch split             batch sharded P("data")
  DDP gradient all-reduce (backward hook)    lax.psum of backbone grads
  per-rank BatchNorm (broadcast_buffers=F)   local BN stats in shard_map,
                                             pmean'd once per step
  AMP + MaxClipGradScaler                    bf16 compute policy (no scaler
                                             needed on TPU)
  clip_grad_norm_(5)                         clip_by_global_norm on the
                                             psum'd (true) grads
  PartialFC manual fwd/bwd + NCCL            heads/partial_fc.py inside the
                                             same shard_map

Loss composition (`train.py:252-264`): total = CE(final_cls, label)
+ lambda1 * consensus(final_seg, msk), where final_cls already carries the
reference's "+ kd" constant-logit-shift quirk (see nn/msml.py). All loss
terms are *global* batch means via psum, so per-shard grads sum to the true
gradient of the global mean (the DDP-mean equivalence).

Batch-size convention matches the reference yaml: cfg.batch_size is
*per-chip* (per-rank); the LR scaling uses batch_size * world like
`train.py:158-177`.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msml_tpu.core.mesh import (DATA_AXIS, SLICE_AXIS, batch_axes,
                                batch_sharding, class_sharding, mesh_world,
                                replicated)
from msml_tpu.heads.partial_fc import PartialFC, init_pfc_weight
from msml_tpu.losses import structure_consensus_loss
from msml_tpu.train import optim


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    momentum: Any
    pfc_weight: Optional[jnp.ndarray] = None
    pfc_momentum: Optional[jnp.ndarray] = None


def init_train_state(model, cfg, rng, mesh: Mesh,
                     use_pfc: bool = False) -> TrainState:
    """Initialise params on host then shard: everything replicated except the
    PartialFC class-sharded weight."""
    h = w = 128 if cfg.is_gray else 112
    c = 1 if cfg.is_gray else 3
    x = jnp.zeros((2, h, w, c), jnp.float32)
    label = jnp.zeros((2,), jnp.int32)
    ori = x if cfg.peer_params.get("use_ori") else None
    variables = model.init({"params": rng, "dropout": rng}, x, label, ori,
                           train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    repl = replicated(mesh)
    params = jax.device_put(params, repl)
    batch_stats = jax.device_put(batch_stats, repl)
    momentum = jax.device_put(optim.init_momentum(params), repl)

    pfc_weight = pfc_momentum = None
    if use_pfc:
        world = mesh.shape[DATA_AXIS]
        pfc_weight = init_pfc_weight(jax.random.fold_in(rng, 7),
                                     cfg.num_classes, world, cfg.dim_feature)
        shard = class_sharding(mesh)
        pfc_weight = jax.device_put(pfc_weight, shard)
        pfc_momentum = jax.device_put(jnp.zeros_like(pfc_weight), shard)

    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, momentum=momentum,
                      pfc_weight=pfc_weight, pfc_momentum=pfc_momentum)


def make_train_step(model, cfg, mesh: Mesh, lr_scales,
                    pfc: Optional[PartialFC] = None, scan_steps: int = 1,
                    scan_unroll: int = 2):
    """Build the jitted SPMD train step.

    step(state, batch, lr_factor, rng) -> (state, metrics)
      batch: dict with 'img', 'label' (+ 'msk' when use_osb, 'ori' when
             use_ori) — leading dim = global batch, sharded over "data".
      lr_factor: LambdaLR epoch factor (core.config.lr_step_factor).
      lr_scales: pytree of python-float per-param LRs
                 (optim.build_lr_scales), closed over as constants.
      scan_unroll: lax.scan unroll factor for the multi-step window
                   (0 = full unroll). The device-side while-loop carries
                   measurable per-iteration overhead (~7% of step time in
                   the round-3 trace); unrolling removes it and lets XLA
                   schedule across step boundaries. Numerics unchanged.
    """
    use_osb = bool(cfg.use_osb)
    use_ori = bool(cfg.peer_params.get("use_ori"))
    lambda1 = float(cfg.lambda1)
    # The reference adds the scalar KD loss to every logit (msml.py:171),
    # which is softmax-CE-invariant — KD has *zero* gradient effect there.
    # kd_loss_weight > 0 makes it a real loss term (capability the paper
    # intends); 0.0 keeps reference behavior.
    kd_weight = float(cfg.get("kd_loss_weight", 0.0))
    # device_light mode: batches arrive uint8 (host stops after decode +
    # occlusion + flip); /255 + Gaussian relighting + normalize run here,
    # inside the jitted step (kernels/augment.device_input_stage) — 4x
    # smaller host->device transfer, no per-sample float work on the host
    device_light = bool(cfg.get("device_light"))
    dl_gauss = bool(cfg.get("gauss_light", True))
    dl_norm = bool(cfg.use_norm)
    clip_norm = float(cfg.grad_clip_norm)
    wd = float(cfg.weight_decay)
    momentum_coef = float(cfg.momentum)
    use_pfc = pfc is not None
    # Multi-slice (DCN) topology, see core/mesh.py: the batch is sharded
    # over every mesh axis; PartialFC class shards + their per-step
    # feature/logit collectives live on the inner "data" axis (ICI); the
    # only cross-slice traffic is the once-per-step grad reduction.
    slice_axis = SLICE_AXIS if SLICE_AXIS in mesh.axis_names else None
    world = mesh.shape[DATA_AXIS]       # class shards (per slice)
    world_total = mesh_world(mesh)      # global data-parallel width
    all_axes = ((slice_axis, DATA_AXIS) if slice_axis else DATA_AXIS)
    if use_pfc and pfc.slice_axis != slice_axis:
        import dataclasses
        pfc = dataclasses.replace(pfc, slice_axis=slice_axis)
    # sampled PFC: presample the class subset OUTSIDE the autodiff closure
    # and differentiate wrt the gathered rows — kills the dense scatter-add
    # (AD transpose of the in-closure gather; 5% of the ir100 step, PERF.md)
    use_pfc_rows = (use_pfc and int(pfc.sample_rate) != 1
                    and pfc.num_sample(world) < pfc.num_local(world))
    pfc_base_lr = cfg.lr / 512.0 * cfg.batch_size * world_total
    axis = DATA_AXIS

    def shard_body(state: TrainState, batch, lr_factor, rng):
        my = lax.axis_index(axis)
        if slice_axis is not None:
            my = lax.axis_index(slice_axis) * world + my
        step_rng = jax.random.fold_in(jax.random.fold_in(rng, state.step), my)
        # PFC sampling rng: device-invariant here (presample/loss fold the
        # DATA index internally); slice replicas of a shard must select the
        # identical class subset, so the SLICE index must never enter it.
        # Domain-separated from step_rng (0x9FC tag): otherwise on a 1-D
        # mesh fold_in(this, data_idx) would REUSE the dropout key for the
        # sampling uniform draw
        pfc_rng = jax.random.fold_in(jax.random.fold_in(rng, 0x9FC),
                                     state.step)
        img, label = batch["img"], batch["label"]
        ori = batch["ori"] if use_ori else None
        if device_light:
            from msml_tpu.kernels.augment import device_input_stage
            img = device_input_stage(img, jax.random.fold_in(step_rng, 0xD11),
                                     gauss_light=dl_gauss, use_norm=dl_norm)
            if ori is not None:  # host never relights ori (load_dataset 114)
                ori = device_input_stage(ori, step_rng, gauss_light=False,
                                         use_norm=dl_norm)
        global_b = img.shape[0] * world_total

        if use_pfc_rows:
            pfc_index, pfc_local_label = pfc.presample(label, pfc_rng)
            pfc_rows = state.pfc_weight.at[pfc_index].get(
                unique_indices=True, indices_are_sorted=True,
                mode="promise_in_bounds")

        def loss_fn(params, pfc_weight):
            variables = {"params": params, "batch_stats": state.batch_stats}
            outs, mutated = model.apply(
                variables, img, None if use_pfc else label, ori,
                train=True, rngs={"dropout": step_rng},
                mutable=["batch_stats", "losses"])
            head_out, final_seg, kd = outs
            # recover-decoder loss, already scaled by decoder_loss_weight
            # (sown in nn/iresnet.py; independent of kd_loss_weight)
            rec_loss = sum(jnp.asarray(v, jnp.float32).sum()
                           for v in jax.tree.leaves(
                               mutated.get("losses", {})))

            if use_pfc_rows:
                cls_loss, pfc_aux = pfc.loss_rows(pfc_weight, head_out,
                                                  pfc_local_label, pfc_index)
                nll = pfc_aux["nll"]
                sample_index = pfc_aux["sample_index"]
            elif use_pfc:
                cls_loss, pfc_aux = pfc.loss(pfc_weight, head_out, label,
                                             pfc_rng)
                nll = pfc_aux["nll"]
                sample_index = pfc_aux["sample_index"]
            else:
                logp = jax.nn.log_softmax(head_out.astype(jnp.float32), -1)
                row_nll = -jnp.take_along_axis(logp, label[:, None], 1)[:, 0]
                cls_loss = lax.psum(row_nll.sum(), all_axes) / global_b
                nll = cls_loss
                sample_index = None
            if use_pfc and slice_axis is not None:
                # PFC runs per-slice over its own batch rows; the global
                # CE is the mean of equal-sized per-slice means (the AD
                # transpose of this pmean carries the 1/S into the
                # per-slice pfc grads, summed below)
                cls_loss = lax.pmean(cls_loss, slice_axis)
                nll = lax.pmean(nll, slice_axis)

            if use_osb:
                seg_local = structure_consensus_loss(final_seg, batch["msk"])
                seg_loss = lax.pmean(seg_local, all_axes)
            else:
                seg_loss = jnp.float32(0.0)

            kd = lax.pmean(jnp.asarray(kd, jnp.float32), all_axes)
            rec_loss = lax.pmean(jnp.asarray(rec_loss, jnp.float32),
                                 all_axes)
            total = (cls_loss + lambda1 * seg_loss + kd_weight * kd
                     + rec_loss)
            aux_out = dict(batch_stats=mutated["batch_stats"], nll=nll,
                           cls_loss=cls_loss, seg_loss=seg_loss, kd=kd,
                           sample_index=sample_index)
            return total, aux_out

        if use_pfc:
            (total, aux), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                state.params,
                pfc_rows if use_pfc_rows else state.pfc_weight)
            bb_grads, pfc_grad = grads
        else:
            (total, aux), bb_grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, None)
            pfc_grad = None

        # DDP-equivalent: sum partial per-shard grads into the true gradient
        bb_grads = lax.psum(bb_grads, all_axes)
        if use_pfc and slice_axis is not None:
            # slice replicas hold 1/S-scaled per-slice grads of the same
            # weight rows (pmean transpose): one cross-slice (DCN) psum
            # makes the replicated shard's update consistent
            pfc_grad = lax.psum(pfc_grad, slice_axis)
        bb_grads, gnorm = optim.clip_by_global_norm(bb_grads, clip_norm)

        new_params, new_momentum = optim.sgd_update(
            state.params, bb_grads, state.momentum, lr_scales, lr_factor,
            wd, momentum_coef)

        new_pfc_w, new_pfc_m = state.pfc_weight, state.pfc_momentum
        if use_pfc_rows:
            new_pfc_w, new_pfc_m = optim.pfc_sgd_update_rows(
                state.pfc_weight, pfc_grad, state.pfc_momentum, pfc_base_lr,
                lr_factor, wd, momentum_coef, pfc_index)
        elif use_pfc:
            new_pfc_w, new_pfc_m = optim.pfc_sgd_update(
                state.pfc_weight, pfc_grad, state.pfc_momentum, pfc_base_lr,
                lr_factor, wd, momentum_coef, aux["sample_index"])

        # per-shard BN stats -> replicated running stats (documented
        # deviation: the reference keeps per-rank buffers and checkpoints
        # rank 0's; averaging is equivalent-or-better and keeps state SPMD)
        new_bs = lax.pmean(aux["batch_stats"], all_axes)

        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, momentum=new_momentum,
                                  pfc_weight=new_pfc_w, pfc_momentum=new_pfc_m)
        metrics = dict(total_loss=total, cls_loss=aux["cls_loss"],
                       seg_loss=aux["seg_loss"], kd=aux["kd"],
                       nll=aux["nll"], grad_norm=gnorm)
        return new_state, metrics

    def _state_spec(state: TrainState) -> TrainState:
        return TrainState(
            step=P(),
            params=jax.tree.map(lambda _: P(), state.params),
            batch_stats=jax.tree.map(lambda _: P(), state.batch_stats),
            momentum=jax.tree.map(lambda _: P(), state.momentum),
            pfc_weight=P(axis) if state.pfc_weight is not None else None,
            pfc_momentum=P(axis) if state.pfc_momentum is not None else None)

    _metric_keys = ("total_loss", "cls_loss", "seg_loss", "kd", "nll",
                    "grad_norm")

    b_axes = batch_axes(mesh)

    # On multi-slice meshes the static replication checker cannot infer
    # that the PFC weight/momentum stay slice-replicated (the update is
    # provably slice-invariant: pod-wide selection labels + data-only rng
    # fold + cross-slice-psum'd grads — but the VMA analysis can't follow
    # that algebra). Disabled ONLY for that case; the bit-identical-replica
    # regression test covers it empirically (tests/test_multislice.py).
    _sm_kwargs = {"check_vma": False} if (slice_axis and use_pfc) else {}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, lr_factor, rng):
        body = jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(_state_spec(state),
                      jax.tree.map(lambda _: P(b_axes), batch), P(), P()),
            out_specs=(_state_spec(state),
                       {k: P() for k in _metric_keys}),
            **_sm_kwargs)
        return body(state, batch, lr_factor, rng)

    def bound_step(state, batch, lr_factor, rng):
        return step(state, batch, jnp.asarray(lr_factor, jnp.float32), rng)

    bound_step._jit = step  # AOT access: ._jit.lower(...).compile()

    if scan_steps <= 1:
        return bound_step

    # Multi-step window: lax.scan over `scan_steps` stacked batches inside
    # one jit. Numerically identical to that many sequential calls (the
    # per-step RNG folds in state.step, which advances inside the scan);
    # amortizes per-dispatch host/tunnel latency (~2 ms/step measured
    # through the axon relay — PERF.md).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(state, batches, lr_factor, rng):
        def one(carry, batch):
            new_c, metrics = step(carry, batch, lr_factor, rng)
            return new_c, metrics

        unroll = scan_steps if scan_unroll in (0, None) else scan_unroll
        state, ms = lax.scan(one, state, batches, unroll=int(unroll))
        return state, jax.tree.map(lambda m: jnp.mean(m, axis=0), ms)

    def bound_multi(state, batches, lr_factor, rng):
        """batches: pytree with leading dim scan_steps over global batches."""
        return multi(state, batches, jnp.asarray(lr_factor, jnp.float32),
                     rng)

    bound_multi._jit = multi  # AOT access: ._jit.lower(...).compile()
    return bound_multi


def make_eval_step(model, mesh: Mesh):
    """Jitted feature extraction: (params, batch_stats, img) -> embeddings
    (the eval contract of `msml.py:173-174`).

    The batch is sharded over the mesh (the reference's nn.DataParallel
    eval analogue, qeval_mxnet.py:162) — callers may pass any host batch
    size; it is zero-padded up to a multiple of the mesh and the padding
    rows are dropped from the returned features. For a quantized forward
    use make_quantized_eval_step — the weights must be closed over (not
    passed per call) for the int8 constant folding to happen."""

    @jax.jit
    def eval_step(params, batch_stats, img):
        feature, _ = model.apply({"params": params,
                                  "batch_stats": batch_stats},
                                 img, train=False)
        return feature

    pad_shard = _pad_shard(mesh)

    def bound(params, batch_stats, img):
        return pad_shard(lambda x: eval_step(params, batch_stats, x), img)

    return bound


def make_quantized_eval_step(model, params, batch_stats, mesh: Mesh,
                             quant: str = "int8"):
    """PTQ eval forward: (img) -> embeddings with the same pad-and-drop
    mesh discipline as make_eval_step. The weights are closed over so the
    int8 transform (core/quantize.py) folds them to int8 constants at
    trace time — passed per call they would be traced, staging per-batch
    requantization instead. Per-sample activation scales make padded rows
    and re-batching bit-inert."""
    if quant != "int8":
        raise ValueError(f"unknown quant mode {quant!r}")
    from msml_tpu.core.quantize import quantize_fn
    variables = {"params": params, "batch_stats": batch_stats}

    def fwd(img):
        feature, _ = model.apply(variables, img, train=False)
        return feature

    return shard_eval(jax.jit(quantize_fn(fwd)), mesh)


def _pad_shard(mesh: Mesh):
    """(fn, img) -> fn(padded+sharded img) minus the padding rows; the
    sharding objects are built once per mesh, not per batch."""
    n = mesh_world(mesh)
    sharding = batch_sharding(mesh)

    def run(fn, img):
        b = img.shape[0]
        pad = (-b) % n
        if pad:
            img = jnp.concatenate(
                [jnp.asarray(img),
                 jnp.zeros((pad,) + tuple(img.shape[1:]), img.dtype)])
        img = jax.device_put(jnp.asarray(img), sharding)
        return fn(img)[:b]

    return run


def shard_eval(fn, mesh: Mesh):
    """Wrap a jitted (img) -> features forward with the mesh pad-and-drop
    discipline: any host batch size is zero-padded to a multiple of the
    mesh, the batch axis is sharded over it, and the padding rows are
    dropped from the result. Used by the eval-step builders above and the
    serving runners (cli/serve.py) so every eval path — including
    quantized closures — is multi-chip."""
    run = _pad_shard(mesh)

    def bound(img):
        return run(fn, img)

    return bound
