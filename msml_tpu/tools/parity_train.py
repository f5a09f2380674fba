"""Training-step parity: the reference's training math executed in place vs
ours — same weights, same batch, losses AND gradients compared.

The eval chains are pinned (parity_lfw / parity_occ / parity_ijb); this tool
pins the remaining chain: the TRAINING forward + loss + backward of
`/root/reference/train.py:252-277`:

  reference (run in place, never copied):
    backbones.MSML(img, label, ori) -> (final_cls, final_seg, kd)   train mode
    cls_loss = torch.nn.CrossEntropyLoss()(final_cls, label)        train.py:262
    seg_loss = StructureConsensuLossFunction(10,5,'idx','idx')(
                   final_seg, msk, msk)                             train.py:229,258
    total = cls_loss + lambda1 * seg_loss  (lambda1 = 1, config.py:79)
    total.backward() -> per-parameter grads
  ours:
    tools/import_torch transliteration (incl. the margin head) ->
    nn/msml.py train apply -> losses as in train/train_step.py loss_fn ->
    jax.grad

Torch gradients are transliterated into our parameter tree with the SAME
import mapping as the weights (every mapping op is a layout
transpose/reshape, which commutes with d/dw), so the comparison is leaf-for-
leaf: per top-level module we report max-abs grad delta (relative to the
reference grad absmax) and flattened cosine similarity. Both stacks run f32
on CPU; the pinned quantities are the losses (CE + consensus seg + the
kd-logit-add quirk, msml.py:171) and the full backward through the margin
head, FM chain, detach-link OSB and BN train-mode statistics.

Usage:  python -m msml_tpu.tools.parity_train [--batch 8] [--classes 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def make_batch(batch: int, num_classes: int, seed: int):
    """Deterministic synthetic batch: [-1,1] images, binary rectangle
    masks (both blob ids present, like real occlusion masks), labels."""
    import numpy as np
    rng = np.random.RandomState(seed)
    img = rng.uniform(-1.0, 1.0, (batch, 3, 112, 112)).astype(np.float32)
    msk = np.zeros((batch, 112, 112), np.int64)
    for i in range(batch):
        h = rng.randint(20, 70)
        w = rng.randint(20, 70)
        y = rng.randint(0, 112 - h)
        x = rng.randint(0, 112 - w)
        msk[i, y:y + h, x:x + w] = 1
    label = rng.randint(0, num_classes, (batch,)).astype(np.int64)
    return img, msk, label


def run_reference(tmodel, img, msk, label, lambda1: float):
    """The reference training math, its own modules executed in place."""
    import torch
    from tricks.consensus_loss import StructureConsensuLossFunction

    seg_criterion = StructureConsensuLossFunction(10.0, 5.0, "idx", "idx")
    cls_criterion = torch.nn.CrossEntropyLoss()

    tmodel.train()
    tmodel.zero_grad()
    t_img = torch.from_numpy(img)
    t_msk = torch.from_numpy(msk)
    t_label = torch.from_numpy(label)
    final_cls, final_seg, kd = tmodel(t_img, t_label, None)
    seg_loss = seg_criterion(final_seg, t_msk.clone(), t_msk)
    cls_loss = cls_criterion(final_cls, t_label)
    total = cls_loss + lambda1 * seg_loss
    total.backward()

    grad_sd = {}
    for name, p in tmodel.named_parameters():
        grad_sd[name] = (p.grad if p.grad is not None
                         else torch.zeros_like(p)).detach().numpy().copy()
    for name, buf in tmodel.named_buffers():
        grad_sd[name] = buf.detach().numpy().copy()  # layout placeholders
    losses = {"cls": float(cls_loss), "seg": float(seg_loss),
              "total": float(total), "kd": float(kd)}
    return losses, grad_sd


def run_ours(state_dict, img, msk, label, num_classes: int, lambda1: float):
    """Our training loss + grad on the transliterated weights."""
    import jax
    import jax.numpy as jnp

    from msml_tpu.core.config import Config, config_init
    from msml_tpu.core.precision import FULL_PRECISION
    from msml_tpu.losses.consensus import structure_consensus_loss
    from msml_tpu.nn.msml import msml_from_config
    from msml_tpu.tools.import_torch import (import_msml_checkpoint,
                                             merge_into)

    cfg = Config.from_dict({
        "dataset": "webface", "fp16": False, "batch_size": int(img.shape[0]),
        "frb_type": "iresnet18", "osb_type": "unet", "use_osb": True,
        "fm_layers": [1, 1, 1, 1], "fm_params": [3, 2, "sigmoid", "mul"],
        "peer_params": {"use_ori": False, "use_conv": False,
                        "mask_trans": "conv", "use_decoder": False},
        "header_type": "AMArcFace", "header_params": [64.0, 0.48, 0.0, 0.0],
        "exp_id": 0, "output_prefix": "parity", "out_folder": "/tmp"})
    config_init(cfg, make_output_dir=False)
    cfg.num_classes = num_classes

    params_in, stats_in = import_msml_checkpoint(state_dict)
    model = msml_from_config(cfg, policy=FULL_PRECISION)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 112, 112, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x0,
                           jnp.zeros((1,), jnp.int32), train=True)
    params = merge_into(jax.device_get(variables["params"]), params_in)
    stats = merge_into(jax.device_get(variables["batch_stats"]), stats_in)

    j_img = jnp.asarray(img.transpose(0, 2, 3, 1))          # NCHW -> NHWC
    j_msk = jnp.asarray(msk, jnp.int32)
    j_label = jnp.asarray(label, jnp.int32)

    def loss_fn(p):
        outs, _ = model.apply(
            {"params": p, "batch_stats": stats}, j_img, j_label, None,
            train=True, rngs={"dropout": rng},
            mutable=["batch_stats", "losses"])
        final_cls, final_seg, kd = outs
        logp = jax.nn.log_softmax(final_cls.astype(jnp.float32), -1)
        cls_loss = -jnp.take_along_axis(logp, j_label[:, None], 1).mean()
        seg_loss = structure_consensus_loss(final_seg, j_msk)
        total = cls_loss + lambda1 * seg_loss
        return total, dict(cls=cls_loss, seg=seg_loss,
                           kd=jnp.asarray(kd, jnp.float32))

    (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    losses = {"cls": float(aux["cls"]), "seg": float(aux["seg"]),
              "total": float(total), "kd": float(aux["kd"])}

    # f32 noise-floor calibration: the same math on a permuted batch is
    # bit-identical in exact arithmetic (all losses are batch means), so
    # the grad delta between the two orderings measures pure f32
    # reduction-order noise — the scale against which the cross-stack
    # delta must be judged.
    import numpy as np
    perm = np.random.RandomState(123).permutation(img.shape[0])
    j_img2, j_msk2, j_label2 = j_img[perm], j_msk[perm], j_label[perm]

    def loss_fn_perm(p):
        outs, _ = model.apply(
            {"params": p, "batch_stats": stats}, j_img2, j_label2, None,
            train=True, rngs={"dropout": rng},
            mutable=["batch_stats", "losses"])
        final_cls, final_seg, kd = outs
        logp = jax.nn.log_softmax(final_cls.astype(jnp.float32), -1)
        cls_loss = -jnp.take_along_axis(logp, j_label2[:, None], 1).mean()
        seg_loss = structure_consensus_loss(final_seg, j_msk2)
        return cls_loss + lambda1 * seg_loss

    grads_perm = jax.grad(loss_fn_perm)(params)
    return losses, jax.device_get(grads), jax.device_get(grads_perm)


def run_reference_traj(tmodel, batches, lambda1, lr_factors, base_lr,
                       batch_size, world_size, pretrained):
    """N full reference optimizer steps, its own modules executed in place:
    the param-group construction of `train.py:153-178`, torch SGD
    (momentum 0.9, weight_decay 5e-4, `config.py:74-75`), clip_grad_norm_
    max_norm=5 (`train.py:270,276`) and the LambdaLR factor (`train.py:193`,
    stepped once per batch here so every factor in `lr_factors` is
    exercised)."""
    import torch
    from torch.nn.utils import clip_grad_norm_
    from tricks.consensus_loss import StructureConsensuLossFunction

    seg_criterion = StructureConsensuLossFunction(10.0, 5.0, "idx", "idx")
    cls_criterion = torch.nn.CrossEntropyLoss()

    params = []
    for name, value in tmodel.named_parameters():
        if "osb" in name:
            params += [{"params": value,
                        "lr": 0.01 / 512 * batch_size * world_size}]
        elif not pretrained:
            params += [{"params": value}]
        elif "classification" in name:
            params += [{"params": value,
                        "lr": 10 * base_lr / 512 * batch_size * world_size}]
        elif "fm_ops" in name:
            params += [{"params": value,
                        "lr": 0.1 / 512 * batch_size * world_size}]
        else:
            params += [{"params": value}]
    opt = torch.optim.SGD(params,
                          lr=base_lr / 512 * batch_size * world_size,
                          momentum=0.9, weight_decay=5e-4)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lr_lambda=lambda e: lr_factors[min(e, len(lr_factors) - 1)])

    tmodel.train()
    losses, norms = [], []
    for img, msk, label in batches:
        opt.zero_grad()
        t_img = torch.from_numpy(img)
        t_msk = torch.from_numpy(msk)
        t_label = torch.from_numpy(label)
        final_cls, final_seg, _kd = tmodel(t_img, t_label, None)
        seg_loss = seg_criterion(final_seg, t_msk.clone(), t_msk)
        cls_loss = cls_criterion(final_cls, t_label)
        total = cls_loss + lambda1 * seg_loss
        total.backward()
        norm = clip_grad_norm_(tmodel.parameters(), max_norm=5, norm_type=2)
        opt.step()
        sched.step()
        losses.append(float(total))
        norms.append(float(norm))
    sd = {k: v.detach().numpy().copy()
          for k, v in tmodel.state_dict().items()}
    return losses, norms, sd


def run_ours_traj(state_dict, batches, num_classes, lambda1, lr_factors,
                  base_lr, batch_size, world_size, pretrained,
                  permute_seed=None):
    """Our full optimizer chain (train/optim.py: build_lr_scales +
    clip_by_global_norm + sgd_update) over the same batches, starting from
    the transliterated weights. With `permute_seed`, every batch is permuted
    before use — mathematically identical (all losses are batch means, BN
    stats are batch means), so the delta between the two orderings is the
    same-stack f32 reduction-order noise floor for the whole trajectory."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from msml_tpu.core.config import Config, config_init
    from msml_tpu.core.precision import FULL_PRECISION
    from msml_tpu.losses.consensus import structure_consensus_loss
    from msml_tpu.nn.msml import msml_from_config
    from msml_tpu.tools.import_torch import (import_msml_checkpoint,
                                             merge_into)
    from msml_tpu.train import optim

    cfg = Config.from_dict({
        "dataset": "webface", "fp16": False, "batch_size": batch_size,
        "frb_type": "iresnet18", "osb_type": "unet", "use_osb": True,
        "fm_layers": [1, 1, 1, 1], "fm_params": [3, 2, "sigmoid", "mul"],
        "peer_params": {"use_ori": False, "use_conv": False,
                        "mask_trans": "conv", "use_decoder": False},
        "header_type": "AMArcFace", "header_params": [64.0, 0.48, 0.0, 0.0],
        "exp_id": 0, "output_prefix": "parity", "out_folder": "/tmp"})
    config_init(cfg, make_output_dir=False)
    cfg.num_classes = num_classes
    cfg.lr = base_lr
    cfg.pretrained = pretrained

    params_in, stats_in = import_msml_checkpoint(state_dict)
    model = msml_from_config(cfg, policy=FULL_PRECISION)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 112, 112, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x0,
                           jnp.zeros((1,), jnp.int32), train=True)
    params = merge_into(jax.device_get(variables["params"]), params_in)
    stats = merge_into(jax.device_get(variables["batch_stats"]), stats_in)

    params_init = jax.device_get(params)
    lr_scales = optim.build_lr_scales(params, cfg, world_size)
    momentum = optim.init_momentum(params)

    def loss_fn(p, s, j_img, j_msk, j_label):
        outs, mutated = model.apply(
            {"params": p, "batch_stats": s}, j_img, j_label, None,
            train=True, rngs={"dropout": rng},
            mutable=["batch_stats", "losses"])
        final_cls, final_seg, _kd = outs
        logp = jax.nn.log_softmax(final_cls.astype(jnp.float32), -1)
        cls_loss = -jnp.take_along_axis(logp, j_label[:, None], 1).mean()
        seg_loss = structure_consensus_loss(final_seg, j_msk)
        total = cls_loss + lambda1 * seg_loss
        return total, mutated["batch_stats"]

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    prng = (np.random.RandomState(permute_seed)
            if permute_seed is not None else None)
    losses, norms = [], []
    for i, (img, msk, label) in enumerate(batches):
        if prng is not None:
            perm = prng.permutation(img.shape[0])
            img, msk, label = img[perm], msk[perm], label[perm]
        j_img = jnp.asarray(img.transpose(0, 2, 3, 1))
        j_msk = jnp.asarray(msk, jnp.int32)
        j_label = jnp.asarray(label, jnp.int32)
        (total, stats), grads = grad_fn(params, stats, j_img, j_msk, j_label)
        grads, norm = optim.clip_by_global_norm(grads, 5.0)
        params, momentum = optim.sgd_update(
            params, grads, momentum, lr_scales,
            jnp.float32(lr_factors[min(i, len(lr_factors) - 1)]),
            weight_decay=5e-4, momentum_coef=0.9)
        losses.append(float(total))
        norms.append(float(norm))
    return losses, norms, params_init, jax.device_get(params)


def compare_grads(ref_grad_sd, our_grads, our_grads_perm):
    """Transliterate torch grads with the weight mapping; compare per
    top-level module, alongside the same-stack f32 noise floor (our grads
    vs our grads on a permuted batch — mathematically identical)."""
    import jax
    import numpy as np

    from msml_tpu.tools.import_torch import (import_msml_checkpoint,
                                             merge_into)

    ref_params, _ = import_msml_checkpoint(ref_grad_sd)
    zeros = jax.tree.map(np.zeros_like, our_grads)
    ref_tree = merge_into(zeros, ref_params)

    mods = {}
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_tree)[0]
    flat_our = jax.tree_util.tree_flatten_with_path(our_grads)[0]
    flat_prm = jax.tree_util.tree_flatten_with_path(our_grads_perm)[0]
    assert len(flat_ref) == len(flat_our) == len(flat_prm)
    for (path_r, r), (path_o, o), (path_p, pm) in zip(flat_ref, flat_our,
                                                      flat_prm):
        assert path_r == path_o == path_p
        top = str(getattr(path_r[0], "key", path_r[0]))
        d = mods.setdefault(top, {"ref": [], "our": [], "perm": []})
        d["ref"].append(np.ravel(np.asarray(r, np.float64)))
        d["our"].append(np.ravel(np.asarray(o, np.float64)))
        d["perm"].append(np.ravel(np.asarray(pm, np.float64)))

    rows = {}
    for top, d in sorted(mods.items()):
        r = np.concatenate(d["ref"])
        o = np.concatenate(d["our"])
        pm = np.concatenate(d["perm"])
        absmax = float(np.max(np.abs(r)))
        delta = float(np.max(np.abs(r - o)))
        noise = float(np.max(np.abs(o - pm)))
        nr, no = np.linalg.norm(r), np.linalg.norm(o)
        cos = float(np.dot(r, o) / max(nr * no, 1e-30))
        rows[top] = {"grad_absmax": absmax, "max_delta": delta,
                     "rel_delta": delta / max(absmax, 1e-30),
                     "norm_rel_delta": float(abs(nr - no) / max(nr, 1e-30)),
                     "noise_floor": noise,
                     "noise_rel": noise / max(absmax, 1e-30), "cos": cos}
    return rows


def main_traj(args):
    """Multi-step optimizer-trajectory parity: N full training steps
    (forward + losses + backward + clip + SGD(momentum, wd) + LR factor)
    in both stacks; the pinned quantities are the per-step losses, the
    per-step pre-clip gradient norms, and the net parameter UPDATE
    (final - initial) per top-level module. The update is compared with the
    same weight-import mapping as single-step grads (layout transforms
    commute with subtraction), against the same-stack permuted-batch noise
    floor compounded over the trajectory."""
    import numpy as np

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import torch  # noqa: F401

    from msml_tpu.tools.parity_lfw import _randomize_torch
    from msml_tpu.tools.parity_occ import _tame_torch_scales, install_stubs

    install_stubs(args.ref_repo)
    if args.ref_repo not in sys.path:
        sys.path.insert(0, args.ref_repo)
    import backbones

    lambda1 = 1.0  # reference config.py:79
    pretrained = True  # exercises all 4 LR groups (train.py:160-172)
    # base_lr x world_size sized so updates clear the f32 ulp of the params
    # (the reference's own from-scratch recipe: lr 0.1, 4 ranks) — at tiny
    # lr the stored-param quantization, not math, dominates final - init
    base_lr = 0.1
    world_size = 4
    # factors include a decay boundary so the LambdaLR multiplication path
    # is exercised mid-trajectory (reference config.py:64-68 step decay)
    lr_factors = [1.0, 1.0, 0.1, 0.1, 0.01, 0.01][:max(args.steps, 1)]
    while len(lr_factors) < args.steps:
        lr_factors.append(lr_factors[-1])

    tmodel = backbones.MSML(
        frb_type="iresnet18", osb_type="unet", fm_layers=(1, 1, 1, 1),
        header_type="AMArcFace", header_params=(64.0, 0.48, 0.0, 0.0),
        num_classes=args.classes, fp16=False, use_osb=True,
        fm_params=(3, 2, "sigmoid", "mul"),
        peer_params={"use_ori": False, "use_conv": False,
                     "mask_trans": "conv", "use_decoder": False})
    _randomize_torch(tmodel, seed=args.seed)
    _tame_torch_scales(tmodel)
    sd0 = {k: v.detach().numpy().copy()
           for k, v in tmodel.state_dict().items()}

    batches = [make_batch(args.batch, args.classes, args.seed + 1 + i)
               for i in range(args.steps)]

    ref_losses, ref_norms, sd_final = run_reference_traj(
        tmodel, batches, lambda1, lr_factors, base_lr, args.batch,
        world_size, pretrained)
    our_losses, our_norms, p_init, p_final = run_ours_traj(
        sd0, batches, args.classes, lambda1, lr_factors, base_lr,
        args.batch, world_size, pretrained)
    _, _, _, p_final_perm = run_ours_traj(
        sd0, batches, args.classes, lambda1, lr_factors, base_lr,
        args.batch, world_size, pretrained, permute_seed=777)

    # the net update, compared through the same linear import mapping
    ref_upd_sd = {k: (sd_final[k].astype(np.float64)
                      - sd0[k].astype(np.float64)).astype(np.float32)
                  for k in sd0}
    import jax as _jax
    our_upd = _jax.tree.map(lambda a, b: np.asarray(a, np.float64)
                            - np.asarray(b, np.float64), p_final, p_init)
    perm_upd = _jax.tree.map(lambda a, b: np.asarray(a, np.float64)
                             - np.asarray(b, np.float64),
                             p_final_perm, p_init)
    upd_rows = compare_grads(ref_upd_sd, our_upd, perm_upd)

    step_rows = []
    for i in range(args.steps):
        dl = abs(ref_losses[i] - our_losses[i])
        dn = abs(ref_norms[i] - our_norms[i])
        step_rows.append({
            "ref_loss": ref_losses[i], "our_loss": our_losses[i],
            "loss_rel": dl / max(abs(ref_losses[i]), 1e-12),
            "ref_grad_norm": ref_norms[i], "our_grad_norm": our_norms[i],
            "norm_rel": dn / max(abs(ref_norms[i]), 1e-12),
            "lr_factor": lr_factors[i],
            "clip_active": bool(ref_norms[i] > 5.0)})

    # per-step losses/norms drift with compounded f32 noise; the update is
    # gated on direction + magnitude + the trajectory noise floor. Updates
    # live in f32 params, so final - init is quantized at the PARAM ulp —
    # the per-element gate must also admit a few ulps of the param scale
    # (at small lr x grad the quantization, not the math, is the floor).
    ok = all(r["loss_rel"] <= 1e-3 and r["norm_rel"] <= 1e-3
             for r in step_rows)
    eps32 = float(np.finfo(np.float32).eps)
    param_absmax = {}
    flat_init = _jax.tree_util.tree_flatten_with_path(p_init)[0]
    for path, leaf in flat_init:
        top = str(getattr(path[0], "key", path[0]))
        param_absmax[top] = max(param_absmax.get(top, 0.0),
                                float(np.max(np.abs(leaf))))
    max_floor = max(r["noise_rel"] for r in upd_rows.values())
    for top, r in upd_rows.items():
        ulp = 8.0 * eps32 * param_absmax.get(top, 1.0)
        r["ulp_floor"] = ulp
        ok &= bool(r["cos"] >= 1.0 - 1e-4
                   and r["norm_rel_delta"] <= 3e-3
                   and (r["max_delta"] <= ulp
                        or r["rel_delta"] <= max(2e-2, 5.0 * max_floor)))

    result = {"steps": step_rows, "updates": upd_rows,
              "clip_engaged_steps": sum(r["clip_active"] for r in step_rows),
              "all_pass": bool(ok)}
    print(json.dumps(result, indent=2))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(result, f, indent=2)
    return result


def main(args):
    if args.steps > 0:
        return main_traj(args)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import numpy as np  # noqa: F401
    import torch

    from msml_tpu.tools.parity_lfw import _randomize_torch
    from msml_tpu.tools.parity_occ import (_tame_torch_scales,
                                           install_stubs)

    install_stubs(args.ref_repo)
    if args.ref_repo not in sys.path:
        sys.path.insert(0, args.ref_repo)
    import backbones  # the reference package, executed in place

    lambda1 = 1.0  # reference config.py:79
    tmodel = backbones.MSML(
        frb_type="iresnet18", osb_type="unet", fm_layers=(1, 1, 1, 1),
        header_type="AMArcFace", header_params=(64.0, 0.48, 0.0, 0.0),
        num_classes=args.classes, fp16=False, use_osb=True,
        fm_params=(3, 2, "sigmoid", "mul"),
        peer_params={"use_ori": False, "use_conv": False,
                     "mask_trans": "conv", "use_decoder": False})
    _randomize_torch(tmodel, seed=args.seed)
    _tame_torch_scales(tmodel)

    img, msk, label = make_batch(args.batch, args.classes, args.seed + 1)

    ref_losses, ref_grad_sd = run_reference(tmodel, img, msk, label, lambda1)
    sd = {k: v.detach().numpy().copy()
          for k, v in tmodel.state_dict().items()}
    our_losses, our_grads, our_grads_perm = run_ours(
        sd, img, msk, label, args.classes, lambda1)

    loss_rows = {}
    for k in ("cls", "seg", "total", "kd"):
        d = abs(ref_losses[k] - our_losses[k])
        loss_rows[k] = {"ref": ref_losses[k], "ours": our_losses[k],
                        "delta": d,
                        "rel": d / max(abs(ref_losses[k]), 1e-12)}
    grad_rows = compare_grads(ref_grad_sd, our_grads, our_grads_perm)

    # f32 CPU both sides: losses are means (tight). For grads, the stable
    # statistics are direction (cosine) and magnitude (L2 norm) — pinned
    # tight. The per-element max delta is reduction-order f32 noise: XLA
    # CPU reductions are thread-nondeterministic, so each module's
    # same-stack noise floor fluctuates run to run (observed 5e-6..5e-2
    # rel); per-element deltas are therefore gated only against the
    # LARGEST floor observed across modules this run — the scale of f32
    # elementwise noise in this net — not a per-module constant.
    ok = all(r["rel"] <= 1e-4 or r["delta"] <= 1e-6
             for r in loss_rows.values())
    max_floor = max(r["noise_rel"] for r in grad_rows.values())
    for top, r in grad_rows.items():
        ok &= bool(r["cos"] >= 1.0 - 1e-5
                   and r["norm_rel_delta"] <= 1e-3
                   and r["rel_delta"] <= max(2e-2, 5.0 * max_floor))

    result = {"losses": loss_rows, "grads": grad_rows, "all_pass": bool(ok)}
    print(json.dumps(result, indent=2))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(result, f, indent=2)
    return result


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="training-step both-stacks parity (losses + grads)")
    p.add_argument("--ref-repo", default="/root/reference")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--classes", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--steps", type=int, default=0,
                   help="N>0: multi-step optimizer-trajectory parity "
                        "(SGD momentum/wd + clip-5 + LR factors over N "
                        "steps) instead of single-step loss+grad parity")
    p.add_argument("--platform", default="cpu",
                   help="jax platform (cpu keeps both stacks on host)")
    p.add_argument("--out-json", default="")
    return p.parse_args(argv)


if __name__ == "__main__":
    main(parse_args())
