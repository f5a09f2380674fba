"""The SPMD training step.

Maps the reference hot loop (`train.py:240-328`) onto a single
`jax.shard_map`'d, jitted function over a 1-D device mesh:

  reference (DDP/NCCL)                       here (ICI collectives)
  -----------------------------------------  ------------------------------
  DistributedSampler batch split             batch sharded P("data")
  DDP gradient all-reduce (backward hook)    the AD transpose of the loss's
                                             psum (vma-typed shard_map
                                             inserts the cross-shard
                                             cotangent psum; an explicit
                                             grad psum would double-count
                                             by world — see the clip-site
                                             comment)
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

from flax import traverse_util

from msml_tpu.core.mesh import (DATA_AXIS, SLICE_AXIS, batch_axes,
                                batch_sharding, class_sharding, mesh_world,
                                replicated)
from msml_tpu.heads.partial_fc import PartialFC, init_pfc_weight
from msml_tpu.losses import structure_consensus_loss
from msml_tpu.train import optim


# --------------------------------------------------------------- FSDP helpers
# ZeRO on the shard_map path: params/momentum leaves are sharded over the
# ``data`` axis per core/fsdp.fsdp_specs; the step all-gathers each sharded
# leaf where it is used (differentiably — AD's transpose of the tiled
# all_gather IS the reduce-scatter of the ZeRO recipe, so sharded leaves'
# grads arrive globally-summed-and-scattered with no explicit collective),
# and the SGD update + momentum write stay shard-local. Composes with
# PartialFC / scan windows / multi-slice because it is a modifier of the
# same shard_map body, and keeps the reference's per-rank-BN DDP semantics
# (unlike the GSPMD FSDP path in core/fsdp.py, which is sync-BN).

def _spec_gather_dim(spec, axis: str):
    """Dimension of ``spec`` sharded over ``axis`` (None = replicated)."""
    for d, ax in enumerate(spec):
        if ax == axis:
            return d
    return None


def _fsdp_gather(tree, specs, axis: str = DATA_AXIS):
    """All-gather every sharded leaf back to full shape (differentiable:
    the transpose is psum_scatter). Must run inside shard_map."""
    flat_t = traverse_util.flatten_dict(tree)
    flat_s = traverse_util.flatten_dict(specs)
    out = {}
    for k, v in flat_t.items():
        d = _spec_gather_dim(flat_s[k], axis)
        out[k] = (v if d is None
                  else lax.all_gather(v, axis, axis=d, tiled=True))
    return traverse_util.unflatten_dict(out)


def _fsdp_clip_by_global_norm(grads, specs, max_norm: float):
    """optim.clip_by_global_norm with the norm assembled across shards:
    sharded leaves contribute psum(local_sq) over ``data`` (their shards
    partition the full grad), replicated leaves contribute directly."""
    flat_g = traverse_util.flatten_dict(grads)
    flat_s = traverse_util.flatten_dict(specs)
    local_sq = jnp.float32(0.0)
    repl_sq = jnp.float32(0.0)
    for k, g in flat_g.items():
        sq = jnp.sum(jnp.square(g.astype(jnp.float32)))
        if _spec_gather_dim(flat_s[k], DATA_AXIS) is not None:
            local_sq = local_sq + sq
        else:
            repl_sq = repl_sq + sq
    norm = jnp.sqrt(repl_sq + lax.psum(local_sq, DATA_AXIS))
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), norm


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    momentum: Any
    pfc_weight: Optional[jnp.ndarray] = None
    pfc_momentum: Optional[jnp.ndarray] = None


def init_train_state(model, cfg, rng, mesh: Mesh,
                     use_pfc: bool = False,
                     fsdp: bool = False) -> TrainState:
    """Initialise params on host then shard: everything replicated except the
    PartialFC class-sharded weight — and, with ``fsdp=True``, the params +
    momentum trees, which are ZeRO-sharded over the ``data`` axis
    (core/fsdp.py specs; the matching step is
    ``make_train_step(..., fsdp=True)``)."""
    h = w = 128 if cfg.is_gray else 112
    c = 1 if cfg.is_gray else 3
    x = jnp.zeros((2, h, w, c), jnp.float32)
    label = jnp.zeros((2,), jnp.int32)
    ori = x if cfg.peer_params.get("use_ori") else None
    variables = model.init({"params": rng, "dropout": rng}, x, label, ori,
                           train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    repl = replicated(mesh)
    if fsdp:
        from msml_tpu.core.fsdp import shard_params_fsdp
        params = shard_params_fsdp(params, mesh)
        momentum = shard_params_fsdp(optim.init_momentum(params), mesh)
    else:
        params = jax.device_put(params, repl)
        momentum = jax.device_put(optim.init_momentum(params), repl)
    batch_stats = jax.device_put(batch_stats, repl)

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
                    scan_unroll: int = 2, fsdp: bool = False):
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
      fsdp: ZeRO-shard params + momentum over ``data`` (state from
            ``init_train_state(..., fsdp=True)``); see the FSDP helpers
            above. Numerically equal to the replicated step up to float
            reassociation, and composes with pfc / scan_steps / slices.
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
    # FSDP param/momentum specs are computed lazily from the first state's
    # GLOBAL leaf shapes (shard_body sees local shards, whose shapes would
    # mis-derive the divisibility rules), then closed over everywhere.
    _fsdp_cell = {}

    def _p_specs(state_params):
        if not fsdp:
            return None
        if "specs" not in _fsdp_cell:
            from msml_tpu.core.fsdp import fsdp_specs
            _fsdp_cell["specs"] = fsdp_specs(state_params, int(world))
        return _fsdp_cell["specs"]

    def shard_body(state: TrainState, batch, lr_factor, rng):
        p_specs = _fsdp_cell.get("specs")
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
            if p_specs is not None:
                # differentiable un-shard: AD's transpose of this gather is
                # the ZeRO reduce-scatter of the backbone grads
                params = _fsdp_gather(params, p_specs)
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

        if use_pfc and slice_axis is not None:
            # The PFC weight is data-sharded but slice-REPLICATED
            # (partially varying): unlike the fully-invariant backbone
            # params below, its cotangent arrives as the per-slice
            # partial (1/S-scaled by the cls pmean transpose) — the vma
            # machinery only auto-reduces cotangents of fully-invariant
            # inputs. One explicit cross-slice (DCN) psum completes the
            # sum AND restores the slice-invariance typing the out_spec
            # P("data") requires (check_vma verifies it).
            pfc_grad = lax.psum(pfc_grad, slice_axis)
        # The backbone grads ARE already the true gradient of the
        # global-mean loss:
        # under shard_map's vma-typed AD, differentiating the psum'd
        # (device-invariant) loss w.r.t. the device-invariant params
        # inserts the cross-shard cotangent psum automatically, and the
        # FSDP gather's transpose is the reduce-scatter. An explicit
        # lax.psum here would DOUBLE-COUNT by world_size — the round-1..3
        # builds carried exactly that bug on this path (masked by the
        # always-engaged clip early in training and by every equality
        # test comparing shard_map against shard_map); caught round 4 by
        # the single-device oracle (tests/test_train_step.py::
        # test_grad_scale_matches_single_device_oracle), and verified by
        # direct probe: explicit-psum grads measure exactly world x the
        # single-device gradient. DDP-mean equivalence holds as written:
        # grad of the global-mean loss == torch DDP's averaged gradient.
        if p_specs is None:
            bb_grads, gnorm = optim.clip_by_global_norm(bb_grads, clip_norm)
        else:
            bb_grads, gnorm = _fsdp_clip_by_global_norm(bb_grads, p_specs,
                                                        clip_norm)

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
        p_specs = _p_specs(state.params)
        if p_specs is None:
            p_specs = jax.tree.map(lambda _: P(), state.params)
        return TrainState(
            step=P(),
            params=p_specs,
            batch_stats=jax.tree.map(lambda _: P(), state.batch_stats),
            momentum=p_specs,
            pfc_weight=P(axis) if state.pfc_weight is not None else None,
            pfc_momentum=P(axis) if state.pfc_momentum is not None else None)

    _metric_keys = ("total_loss", "cls_loss", "seg_loss", "kd", "nll",
                    "grad_norm")

    b_axes = batch_axes(mesh)

    # check_vma stays ON for every mesh/head combination: the vma-typed AD
    # is what makes the in-body gradients carry the correct global scale
    # (see the comment at the clip site) — disabling it switches psum's
    # transpose to psum and every gradient would arrive world_size x too
    # large. Round 3 disabled it for multislice+PFC because the explicit
    # grad psums confused the replication checker; with those psums gone
    # the typed path checks clean.

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, lr_factor, rng):
        body = jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(_state_spec(state),
                      jax.tree.map(lambda _: P(b_axes), batch), P(), P()),
            out_specs=(_state_spec(state),
                       {k: P() for k in _metric_keys}))
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
