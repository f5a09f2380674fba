"""Training entry point.

Parity target: `train.py:29-380` — config init, dataset, MSML, optimizer with
LR groups, LambdaLR epoch schedule, grad clip 5, per-epoch checkpoints,
periodic throughput logging and verification, `--resume`.

Usage (reference `README.md:33-49` analogue — no torch.distributed.launch;
SPMD covers all local chips automatically):
    python -m msml_tpu.cli.train --config config.yaml [--resume] [--occ 1]
    python -m msml_tpu.cli.train --config config.yaml --steps 20   # smoke
"""

from __future__ import annotations

import argparse
import os
import shutil
import time

import jax
import numpy as np

from msml_tpu.core import checkpoint as ckpt
from msml_tpu.core.config import (Config, config_init, default_config,
                                  load_yaml, lr_step_factor)
from msml_tpu.core.logging import AverageMeter, ThroughputLogger, init_logging
from msml_tpu.core.precision import policy_from_config
from msml_tpu.data.pipeline import device_prefetch
from msml_tpu.data.synthetic import SyntheticDataset
from msml_tpu.heads.margin import get_margin_fn
from msml_tpu.heads.partial_fc import PartialFC
from msml_tpu.nn.msml import msml_from_config
from msml_tpu.train import optim
from msml_tpu.train.train_step import init_train_state, make_train_step


def build_dataset(cfg, args, local_world: int):
    """Per-process dataset: batch covers this host's chips; on multi-host
    pods each process reads a disjoint shard (DistributedSampler analogue,
    reference train.py:94-95)."""
    shard_id, num_shards = jax.process_index(), jax.process_count()
    device_light = bool(cfg.get("device_light"))
    if cfg.dataset == "synthetic" or not cfg.rec:
        return SyntheticDataset(
            batch_size=cfg.batch_size * local_world,
            steps_per_epoch=args.steps or 100,
            size=cfg.out_size[0], channels=1 if cfg.is_gray else 3,
            num_classes=cfg.num_classes, uint8=device_light,
            shard_id=shard_id, num_shards=num_shards)
    from msml_tpu.data.face_dataset import FaceByRandOccMask
    return FaceByRandOccMask(
        root_dir=cfg.rec, batch_size=cfg.batch_size * local_world,
        out_size=cfg.out_size, use_norm=cfg.use_norm, is_gray=cfg.is_gray,
        use_ori=bool(cfg.peer_params.get("use_ori")), occ=bool(args.occ),
        occluder_root=cfg.get("occluder_root") or None,
        num_workers=int(cfg.get("nw", 32)) or 32, seed=args.seed,
        gauss_light=bool(cfg.get("gauss_light", True)),
        raw_uint8=device_light,
        shard_id=shard_id, num_shards=num_shards)


def main(args):
    # Preemption-safe checkpointing (beyond the reference, whose only
    # recovery is per-epoch saves + manual --resume, SURVEY §5): TPU VMs
    # are commonly preemptible, and the maintenance event / autoscaler
    # delivers SIGTERM to every process of the pod. The handler only sets
    # a flag; the train loop saves a full orbax checkpoint at the next
    # step boundary and exits cleanly (rc 0), so `--resume` continues at
    # the exact step. Installed first so even a signal during compile is
    # caught; restored in a finally so an aborted run never leaves the
    # flag-only handler behind in a library caller's process.
    import signal
    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True

    prev_sigterm = signal.getsignal(signal.SIGTERM)
    installed = False
    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
        installed = True
    except ValueError:
        pass  # not the main thread (e.g. called from a test harness)
    try:
        return _main_inner(args, preempted)
    finally:
        if installed:
            signal.signal(signal.SIGTERM,
                          prev_sigterm if prev_sigterm is not None
                          else signal.SIG_DFL)


def _main_inner(args, preempted):
    from msml_tpu.core.tpu_flags import apply_tuned_flags
    apply_tuned_flags()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu" and args.cpu_devices > 1:
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={args.cpu_devices}"
            ).strip()
    if args.multihost:
        # multi-host pods: the jax.distributed analogue of the reference's
        # torch.distributed.init_process_group (train.py:44-57); coordinator
        # discovery comes from the TPU environment unless given explicitly
        # (--coordinator host:port --num-processes N --process-id I, the
        # TCP-rendezvous analogue of reference train.py:54)
        if args.coordinator:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id)
        else:
            jax.distributed.initialize()
    # seeds (reference train.py:31-42)
    np.random.seed(1)
    rng = jax.random.PRNGKey(args.seed)

    if args.config and os.path.exists(args.config):
        cfg = load_yaml(args.config)
    else:
        cfg = default_config()
        cfg.dataset = "synthetic"
    config_init(cfg)
    # self-describing weight folder (train.py:71-72 / qeval_mxnet.py:515-517)
    if args.config and os.path.exists(args.config):
        dst = os.path.join(cfg.output, "config.yaml")
        # resuming straight from the copied config: src == dst, skip
        if not (os.path.exists(dst) and os.path.samefile(args.config, dst)):
            shutil.copy(args.config, dst)
    else:
        from msml_tpu.core.config import save_yaml, user_config_dict
        save_yaml(user_config_dict(cfg),
                  os.path.join(cfg.output, "config.yaml"))

    # rank-0 file+stdout logging (utils/utils_logging.py:29-39 contract);
    # other processes log warnings only
    logger = init_logging(cfg.output)
    if jax.process_index() != 0:
        import logging
        logger.setLevel(logging.WARNING)
    use_pfc = float(cfg.get("sample_rate", 1.0)) < 1.0 or bool(
        cfg.get("use_partial_fc", False))
    # One composable parallelism surface (core/parallelism.py): CLI
    # --strategy tokens + the yaml `parallelism:` block + --dcn-slices
    # resolve to a Plan; unsupported compositions fail here with the reason
    from msml_tpu.core import parallelism as par
    try:
        plan = par.parse_strategy(getattr(args, "strategy", "") or "",
                                  cfg, dcn_slices=max(int(args.dcn_slices),
                                                      0))
        par.validate_plan(plan, use_pfc=use_pfc,
                          multihost=jax.process_count() > 1)
    except ValueError as e:
        raise SystemExit(str(e))
    # ONE mesh construction for every family, honoring the plan's slices
    # whether they came from --dcn-slices or the yaml parallelism block
    mesh = par.build_mesh(plan)
    from msml_tpu.core.mesh import mesh_world
    world = mesh_world(mesh)
    local_world = jax.local_device_count()
    logger.info("mesh: %d devices / %d processes (%s); strategy %s; "
                "config: %s"
                % (world, jax.process_count(), jax.devices()[0].platform,
                   plan.describe(), dict(cfg)))
    policy = policy_from_config(bool(cfg.get("fp16", True)))
    model = msml_from_config(cfg, policy=policy, external_header=use_pfc)
    pfc = None
    if use_pfc:
        pfc = PartialFC(num_classes=cfg.num_classes,
                        embedding_size=cfg.dim_feature,
                        sample_rate=float(cfg.sample_rate),
                        margin_fn=get_margin_fn(cfg.header_type,
                                                cfg.header_params))

    state = par.init_state(plan, model, cfg, rng, mesh, use_pfc=use_pfc)
    # pretrained backbone/peer overlay (iresnet.py:410-442 / peer loaders);
    # re-places with the state's own shardings, so FSDP/TP layouts survive
    from msml_tpu.tools.load_weights import load_pretrained
    state = load_pretrained(state, cfg)
    lr_scales = optim.build_lr_scales(state.params, cfg, world)
    scan_steps = max(int(args.scan_steps), 1)
    scan_unroll = getattr(args, "scan_unroll", None)
    if scan_unroll is None:  # CLI flag wins; else yaml; else tuned default
        scan_unroll = int(cfg.get("scan_unroll", 2))
    step_fn = par.make_step(plan, model, cfg, mesh, lr_scales, pfc,
                            scan_steps=scan_steps, scan_unroll=scan_unroll)
    if plan.fsdp or plan.tp > 1:
        logger.info(par.layout_summary(plan, state))

    start_epoch = 0
    if args.resume:
        restored = ckpt.restore_checkpoint(cfg.output, state)
        if restored is not None:
            state = restored
            logger.info("backbone resume successfully! step=%d"
                        % int(state.step))
        else:
            logger.info("resume fail, backbone init successfully!")

    # long-lived async checkpoint manager: serialization overlaps training
    # (orbax AsyncCheckpointer; --sync-ckpt restores blocking saves)
    ckpt_writer = ckpt.CheckpointWriter(cfg.output,
                                        async_save=not args.sync_ckpt)

    trainset = build_dataset(cfg, args, local_world)
    steps_per_epoch = len(trainset) // (cfg.batch_size * world)
    total_step = steps_per_epoch * cfg.num_epoch
    if args.steps:
        total_step = min(total_step, args.steps)
    logger.info("Total Step is: %d" % total_step)

    loss_meter = AverageMeter()
    writer = None
    if args.tensorboard and jax.process_index() == 0:
        from msml_tpu.core.logging import MetricsWriter
        writer = MetricsWriter(os.path.join(cfg.output, "tb"), logger)
    tlog = ThroughputLogger(args.log_every, total_step,
                            cfg.batch_size * world, world, logger,
                            writer=writer)

    # in-training verification every 8000 steps, rank 0 only
    # (train.py:215, utils_callbacks.py:22-23: the .bin lives on rank 0)
    from msml_tpu.core.callbacks import CallBackVerification
    from msml_tpu.train.train_step import make_eval_step
    multihost = jax.process_count() > 1
    ver_prepare_fn = None
    if multihost:
        # process-local eval on host copies of the params so rank 0 can
        # verify without a pod-wide collective program; the params are
        # snapshotted to host ONCE per verification round (via prepare_fn)
        # rather than re-fetched on every eval batch. Sharded layouts
        # (fsdp / tp) hold non-addressable shards, which device_get
        # rejects — replicate through a tiny jit first (a no-op for the
        # already-replicated shard_map layout)
        from jax.sharding import NamedSharding, PartitionSpec
        _repl = NamedSharding(mesh, PartitionSpec())

        def _to_host(tree):
            rep = jax.jit(lambda t: t,
                          out_shardings=jax.tree.map(lambda _: _repl,
                                                     tree))(tree)
            return jax.device_get(rep)

        local_eval = jax.jit(lambda p, s, img: model.apply(
            {"params": p, "batch_stats": s}, img, train=False)[0])
        _ver_snap = {}

        def ver_prepare_fn():
            _ver_snap["p"] = _to_host(state.params)
            _ver_snap["s"] = _to_host(state.batch_stats)

        def extract_fn(img_np):
            return np.asarray(local_eval(_ver_snap["p"], _ver_snap["s"],
                                         np.asarray(img_np, np.float32)))
    else:
        eval_step = make_eval_step(model, mesh)

        def extract_fn(img_np):
            return eval_step(state.params, state.batch_stats,
                             img_np.astype(np.float32))

    ver_targets = cfg.get("val_targets", []) \
        if jax.process_index() == 0 else []
    callback_verification = CallBackVerification(
        args.ver_every, ver_targets, cfg.rec, extract_fn,
        image_size=cfg.out_size, is_gray=cfg.is_gray,
        use_norm=cfg.use_norm, logger=logger,
        prepare_fn=ver_prepare_fn,
        # release the host param snapshot after each round — it is a full
        # f32 copy of the model and must not stay resident between rounds
        finish_fn=(_ver_snap.clear if multihost else None))

    global_step = int(state.step)
    start_epoch = global_step // max(steps_per_epoch, 1)
    done = False
    preempt_exit = False
    n_proc = jax.process_count()

    def _preempt_now():
        # Pod-wide agreement: hosts can receive SIGTERM a few ms apart;
        # acting on the local flag alone could let one host enter the
        # collective checkpoint save while another runs one more step —
        # deadlocking the pod inside its preemption grace period. One tiny
        # host-level allgather per dispatched window (multi-host only;
        # every process calls it unconditionally — it is a collective).
        if n_proc == 1:
            return preempted["flag"]
        from jax.experimental import multihost_utils
        flags = multihost_utils.process_allgather(
            np.asarray([preempted["flag"]], np.int32))
        return bool(np.asarray(flags).any())
    use_procs = hasattr(trainset, "epoch") and cfg.get("nw", 0) > 0 and \
        not isinstance(trainset, SyntheticDataset)
    for epoch in range(start_epoch, cfg.num_epoch):
        lr_factor = lr_step_factor(cfg, epoch)
        epoch_iter = (trainset.epoch(epoch, use_processes=True)
                      if use_procs else trainset.epoch(epoch))
        def _crossed(every):
            return every and (global_step // every
                              > (global_step - scan_steps) // every)

        for batch in device_prefetch(epoch_iter, mesh,
                                     scan_steps=scan_steps):
            state, metrics = step_fn(state, batch, lr_factor, rng)
            global_step += scan_steps
            loss_meter.update(float(metrics["total_loss"]))
            tlog(global_step, loss_meter, epoch,
                 extra="lr_factor %.4f" % lr_factor)
            if _crossed(100):
                logger.info(
                    "[exp_%s] seg_loss=%.4f, cls_loss=%.4f, kd_loss=%.4f, "
                    "grad_norm=%.3f" % (
                        cfg.exp_id, float(metrics["seg_loss"]),
                        float(metrics["cls_loss"]), float(metrics["kd"]),
                        float(metrics["grad_norm"])))
                if writer is not None:
                    for tag in ("seg_loss", "cls_loss", "grad_norm"):
                        writer.scalar(tag, float(metrics[tag]), global_step)
                    writer.scalar("kd_loss", float(metrics["kd"]),
                                  global_step)
                    writer.scalar("lr_factor", lr_factor, global_step)
            if _crossed(args.ver_every):
                callback_verification(
                    global_step // args.ver_every * args.ver_every)
            if _crossed(args.ckpt_every):
                # crash-safe mid-epoch checkpoint (the reference only saves
                # per epoch, train.py:366 — SURVEY §5 'crash-safety: none')
                ckpt_writer.save(state, global_step)
                logger.info("periodic checkpoint at step %d" % global_step)
            if _preempt_now():
                ckpt_writer.save(state, global_step)
                ckpt_writer.wait()  # durable before the VM disappears
                logger.warning("SIGTERM received: preemption checkpoint "
                               "saved at step %d, exiting cleanly "
                               "(resume with --resume)" % global_step)
                done = True
                preempt_exit = True
                break
            if args.steps and global_step >= args.steps:
                done = True
                break
        if not preempt_exit:
            ckpt_writer.save(state, global_step)
            logger.info("checkpoint saved at step %d (epoch %d)"
                        % (global_step, epoch))
        if done:
            break
    if hasattr(trainset, "close"):
        trainset.close()
    ckpt_writer.close()  # waits for any in-flight async save
    if writer is not None:
        writer.close()
    logger.info("training finished at step %d" % global_step)
    return state


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="msml_tpu training")
    p.add_argument("--config", type=str, default="config.yaml")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--occ", type=int, default=1,
                   help="use occlusion augmentation (train.py:378)")
    p.add_argument("--steps", type=int, default=0,
                   help="stop after N steps (smoke runs)")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--ver-every", type=int, default=8000,
                   help="verification cadence (train.py:215)")
    p.add_argument("--ckpt-every", type=int, default=0,
                   help="crash-safe mid-epoch checkpoint interval (steps)")
    p.add_argument("--sync-ckpt", action="store_true",
                   help="blocking checkpoint saves (default: async orbax "
                        "saves that overlap training)")
    p.add_argument("--tensorboard", action="store_true",
                   help="write TensorBoard scalars to <output>/tb (the "
                        "working version of the writer the reference plumbs "
                        "but never wires, utils_callbacks.py:80-82)")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--scan-unroll", type=int, default=None,
                   help="lax.scan unroll inside the window (default: yaml "
                        "scan_unroll, else 2 — PERF.md r3 sweep: 2 is "
                        "fastest on v5e)")
    p.add_argument("--strategy", type=str, default="spmd",
                   help="composable '+'-joined tokens "
                        "(core/parallelism.py): spmd|ddp (shard_map "
                        "data parallelism, DDP-parity per-shard BN; "
                        "default) | fsdp (ZeRO params+momentum over "
                        "data; composes with PartialFC, --scan-steps "
                        "and --dcn-slices) | tp:N (GSPMD Megatron "
                        "block sharding; dense heads, sync-BN) | gspmd "
                        "(force the GSPMD family). E.g. 'fsdp', "
                        "'tp:2+fsdp'. The yaml 'parallelism:' block "
                        "sets the same knobs; CLI tokens win")
    p.add_argument("--scan-steps", type=int, default=1,
                   help="train steps per dispatched jit window (lax.scan); "
                        ">1 amortizes host dispatch latency")
    p.add_argument("--platform", type=str, default="",
                   help="override jax platform (e.g. cpu for smoke runs)")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize() for multi-host pods")
    p.add_argument("--coordinator", type=str, default="",
                   help="host:port rendezvous for --multihost (TPU pods "
                        "auto-discover; set explicitly for CPU/manual runs)")
    p.add_argument("--num-processes", type=int, default=0)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--cpu-devices", type=int, default=8,
                   help="virtual device count when --platform cpu")
    p.add_argument("--dcn-slices", type=int, default=0,
                   help="multi-slice pods: number of TPU slices (0 = "
                        "auto-detect from the device topology); builds a "
                        "(slice, data) mesh with PartialFC collectives "
                        "ICI-local and only the per-step grad reduction "
                        "crossing DCN (core/mesh.py)")
    return p.parse_args(argv)


def cli():
    """Console entry point (pyproject [project.scripts])."""
    main(parse_args())


if __name__ == "__main__":
    cli()
