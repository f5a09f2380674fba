"""Shared machinery for GSPMD (global-batch, compiler-partitioned) train
steps.

The shard_map step (train/train_step.py) mirrors the reference's DDP
semantics exactly (per-replica BN, explicit psums — `train.py:133-137`).
The GSPMD families — tensor parallelism (core/tensor_parallel.py) and
FSDP/ZeRO parameter sharding (core/fsdp.py) — instead jit ONE program over
the global batch with sharding hints pinned on the weights, and XLA's SPMD
partitioner owns the collectives. Both families run the SAME step math;
this module holds it once:

- :func:`make_global_batch_step_fn` — the un-jitted step (same loss
  composition as the shard_map step: CE + lambda1 * consensus +
  kd_weight * kd + sown recover loss; SGD with per-param LR scales and
  global-norm clip). BatchNorm reduces over the GLOBAL batch (sync-BN),
  the documented semantic difference from the shard_map path.
- :func:`pin_first_call_jit` — jits it with the *state's own shardings*
  captured on the first call as the jit contract, so every step preserves
  the chosen layout (no silent resharding), with donated state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msml_tpu.core.mesh import DATA_AXIS
from msml_tpu.train import optim

METRIC_KEYS = ("total_loss", "cls_loss", "seg_loss", "kd", "nll",
               "grad_norm")


def make_global_batch_step_fn(model, cfg, lr_scales):
    """``step_fn(state, batch, lr_factor, rng) -> (state, metrics)`` over
    the global batch, no explicit collectives (GSPMD inserts them)."""
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

    return step_fn


def pin_first_call_jit(step_fn, mesh: Mesh, scan_steps: int = 1,
                       scan_unroll: int = 2):
    """Jit ``step_fn`` with the first call's state shardings pinned as the
    in/out contract (donated state, batch sharded over ``data``, scalars
    replicated). Returns ``bound(state, batch, lr_factor, rng)``.

    With ``scan_steps > 1`` the bound step expects batch leaves with a
    leading ``scan_steps`` dim and runs that many steps per dispatch via
    ``lax.scan`` inside one jit (metrics are the window mean) — the same
    multi-step window the shard_map path ships (train_step.py), now on the
    GSPMD families (TP / FSDP / TP+FSDP) so ``--scan-steps`` composes with
    every strategy."""
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    win_sh = NamedSharding(mesh, P(None, DATA_AXIS))  # (scan, batch, ...)
    repl = NamedSharding(mesh, P())
    _jit = None

    if scan_steps > 1:
        def window_fn(state, batches, lr_factor, rng):
            def one(carry, batch):
                return step_fn(carry, batch, lr_factor, rng)
            unroll = scan_steps if scan_unroll in (0, None) else scan_unroll
            state, ms = lax.scan(one, state, batches, unroll=int(unroll))
            return state, jax.tree.map(lambda m: jnp.mean(m, axis=0), ms)
        run_fn, b_sh = window_fn, win_sh
    else:
        run_fn, b_sh = step_fn, batch_sh

    def _build(state, batch):
        nonlocal _jit
        if _jit is None:
            state_sh = jax.tree.map(lambda x: x.sharding, state)
            _jit = jax.jit(
                run_fn, donate_argnums=(0,),
                in_shardings=(state_sh,
                              jax.tree.map(lambda _: b_sh, batch),
                              repl, repl),
                out_shardings=(state_sh, {k: repl for k in METRIC_KEYS}))
        return _jit

    def bound(state, batch, lr_factor, rng):
        return _build(state, batch)(state, batch,
                                    jnp.asarray(lr_factor, jnp.float32),
                                    rng)

    def precompile(state, batch_abstract, rng):
        """AOT-compile without executing (multihost runs compile first,
        then meet at a coordinator barrier, THEN execute — so slow ranks
        never time out a collective while a peer still compiles).
        ``batch_abstract``: a pytree of jax.ShapeDtypeStruct."""
        _build(state, batch_abstract).lower(
            state, batch_abstract, jnp.asarray(1.0, jnp.float32),
            rng).compile()

    bound.precompile = precompile
    return bound
