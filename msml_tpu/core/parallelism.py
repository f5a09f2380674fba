"""One composable parallelism surface for training.

The reference's only composition is DDP x PartialFC (`train.py:133-147` +
`headers/partial_fc.py:118-177`). This framework has seven families; this
module folds the five *training* ones behind a single strategy string /
``parallelism:`` yaml block and one factory, so they compose instead of
living as separate ``make_*_train_step`` islands:

  token        family     what it adds
  -----------  ---------  ------------------------------------------------
  spmd | ddp   shard_map  data parallelism, per-shard BN (DDP parity)
  fsdp         (either)   ZeRO: params + momentum sharded over ``data``
  tp:N         GSPMD      Megatron column/row block sharding, N-way
  gspmd        GSPMD      force the GSPMD family (sync-BN) without TP
  pp:N         pipe       GPipe stack trainer (homogeneous deep stacks,
                          cli.train_stack / train/stack.py — the MSML
                          composite itself is not pipelineable)

Composition matrix (x = compose, PFC comes from the config's
``use_partial_fc``/``sample_rate`` like the reference's config.py:97):

  shard_map family: data x slices x PartialFC x fsdp x scan windows
  GSPMD family:     data x tp x fsdp x scan windows   (dense heads)

Multi-slice (``--dcn-slices``) stays a shard_map-family feature: the
(slice, data) mesh keeps PartialFC/FSDP collectives on ICI. TP requires
the GSPMD family (its per-block psums are partitioner-inserted); PartialFC
requires shard_map (its manual-gradient-parity collectives are explicit).
Spatial partitioning is not a train-step strategy by design: it serves
the eval/serving forward (core/spatial.py). Pipeline parallelism (pp:N)
is a train strategy with its own entry point (cli.train_stack): GPipe
over homogeneous block stacks with the flagship step's full optimizer
semantics (train/stack.py).

Every composition is numerically equal to the replicated data-parallel
step up to float reassociation (tests/test_parallelism.py), with one
documented semantic split: the GSPMD family is sync-BN, the shard_map
family is per-shard BN like the reference's DDP.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from msml_tpu.core.mesh import DATA_AXIS, SLICE_AXIS, make_mesh

_TOKENS = ("spmd", "ddp", "fsdp", "gspmd", "tp:<N>", "pp:<N>")


@dataclasses.dataclass(frozen=True)
class Plan:
    """Parsed parallelism plan. ``family`` is derived: TP (or an explicit
    ``gspmd`` token) selects the GSPMD global-batch step; everything else
    runs on the shard_map step."""

    fsdp: bool = False
    tp: int = 1
    gspmd: bool = False
    slices: int = 0        # 0 = single slice / auto-detect (shard_map only)
    pp: int = 1            # pipeline stages (homogeneous stack trainer)

    @property
    def family(self) -> str:
        if self.pp > 1:
            return "pipe"
        return "gspmd" if (self.tp > 1 or self.gspmd) else "spmd"

    def describe(self) -> str:
        bits = [self.family]
        if self.tp > 1:
            bits.append(f"tp:{self.tp}")
        if self.pp > 1:
            bits.append(f"pp:{self.pp}")
        if self.fsdp:
            bits.append("fsdp")
        if self.slices:
            bits.append(f"slices:{self.slices}")
        return "+".join(bits)


def parse_strategy(strategy: str = "", cfg=None,
                   dcn_slices: int = 0) -> Plan:
    """Build a Plan from the CLI ``--strategy`` string, the config's
    ``parallelism:`` block, and ``--dcn-slices`` (CLI tokens win over
    yaml). Accepts "+"-joined tokens, e.g. ``fsdp``, ``tp:2``,
    ``fsdp+tp:2``, ``gspmd+fsdp``."""
    block = dict((cfg or {}).get("parallelism") or {})
    fsdp = bool(block.get("fsdp", False))
    tp = int(block.get("tp", 1) or 1)
    gspmd = bool(block.get("gspmd", False))
    slices = int(dcn_slices or block.get("slices", 0) or 0)

    pp = int(block.get("pp", 1) or 1)
    for raw in (strategy or "").split("+"):
        tok = raw.strip().lower()
        if tok in ("", "spmd", "ddp"):
            continue
        if tok == "fsdp":
            fsdp = True
        elif tok == "gspmd":
            gspmd = True
        elif tok.startswith("tp"):
            _, _, n = tok.partition(":")
            if not n.isdigit() or int(n) < 1:
                raise ValueError(f"tensor parallelism needs a width: 'tp:N'"
                                 f" (got {raw!r})")
            tp = int(n)
        elif tok.startswith("pp"):
            _, _, n = tok.partition(":")
            if not n.isdigit() or int(n) < 1:
                raise ValueError(f"pipeline parallelism needs a stage "
                                 f"count: 'pp:N' (got {raw!r})")
            pp = int(n)
        else:
            raise ValueError(f"unknown strategy token {raw!r}: compose from "
                             f"{_TOKENS} with '+'")
    return Plan(fsdp=fsdp, tp=tp, gspmd=gspmd, slices=slices, pp=pp)


def validate_plan(plan: Plan, use_pfc: bool = False,
                  multihost: bool = False) -> None:
    """Reject the combinations that are genuinely unsupported (not merely
    unwired): PartialFC's explicit collectives and the slice layout exist
    only inside the shard_map step, and the pipe family trains homogeneous
    block stacks (cli.train_stack), not the heterogeneous MSML composite."""
    if plan.family == "pipe":
        if plan.fsdp or plan.tp > 1 or plan.gspmd or plan.slices or use_pfc:
            raise ValueError(
                f"strategy '{plan.describe()}' does not compose: pp:N is "
                "the homogeneous-stack GPipe trainer (each stage holds its "
                "own blocks' params/momentum already — ZeRO/TP add nothing "
                "there, and PartialFC/dense heads run replicated at the "
                "jit level)")
        return
    if plan.family == "gspmd":
        if use_pfc:
            raise ValueError(
                f"strategy '{plan.describe()}' uses the GSPMD family, which "
                "supports dense heads only — PartialFC's class sharding "
                "lives on the shard_map path (drop tp/gspmd, keep fsdp: "
                "'fsdp' composes with PartialFC there, and TP's main win — "
                "sharding the 93k-class head — is what PartialFC already "
                "does)")
        if plan.slices:
            raise ValueError(
                f"strategy '{plan.describe()}' does not compose with "
                "--dcn-slices: the ICI-local collective layout is a "
                "shard_map-family feature")
        # multihost composes with the GSPMD family too (r5): the mesh is
        # global, init places host trees onto cross-process NamedShardings,
        # and the batch arrives via make_array_from_process_local_data —
        # proven by tests/test_multihost_gspmd.py (2-process tp:2 == 1x4)


def build_mesh(plan: Plan, devices=None) -> Mesh:
    """The mesh for a plan: (slice?, data) for shard_map strategies,
    (data, model?) for GSPMD ones."""
    if plan.family == "spmd":
        return make_mesh(devices, num_slices=max(plan.slices, 0))
    if plan.pp > 1:
        from msml_tpu.core.pipeline import make_pipe_mesh
        return make_pipe_mesh(plan.pp, devices)
    if plan.tp > 1:
        from msml_tpu.core.tensor_parallel import make_tp_mesh
        return make_tp_mesh(plan.tp, devices)
    devices = list(jax.devices() if devices is None else devices)
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def init_state(plan: Plan, model, cfg, rng, mesh: Mesh,
               use_pfc: bool = False):
    """TrainState placed under the plan's layout."""
    validate_plan(plan, use_pfc=use_pfc)
    if plan.family == "pipe":
        raise ValueError(
            "pp:N trains homogeneous block stacks, not the MSML composite "
            "(its stem/OSB/FM/head stages have different shapes, which the "
            "ring-ppermute schedule cannot stream) — use "
            "`python -m msml_tpu.cli.train_stack --strategy pp:N` "
            "(train/stack.py); MSML itself trains with spmd/fsdp/tp "
            "(docs/distributed.md)")
    from msml_tpu.train.train_step import init_train_state
    if plan.family == "spmd":
        return init_train_state(model, cfg, rng, mesh, use_pfc=use_pfc,
                                fsdp=plan.fsdp)
    if plan.tp > 1:
        from msml_tpu.core.tensor_parallel import init_tp_train_state
        return init_tp_train_state(model, cfg, rng, mesh, fsdp=plan.fsdp)
    if plan.fsdp:
        from msml_tpu.core.fsdp import init_fsdp_train_state
        return init_fsdp_train_state(model, cfg, rng, mesh)
    return init_train_state(model, cfg, rng, mesh, use_pfc=False)


def make_step(plan: Plan, model, cfg, mesh: Mesh, lr_scales, pfc=None,
              scan_steps: int = 1, scan_unroll: int = 2):
    """The train step for a plan: one signature for every composition —
    ``step(state, batch, lr_factor, rng) -> (state, metrics)`` (batch
    leaves gain a leading scan dim when scan_steps > 1)."""
    validate_plan(plan, use_pfc=pfc is not None)
    if plan.family == "pipe":
        raise ValueError(
            "pp:N trains homogeneous block stacks via cli.train_stack "
            "(train/stack.py), not the MSML composite — see init_state")
    if plan.family == "spmd":
        from msml_tpu.train.train_step import make_train_step
        return make_train_step(model, cfg, mesh, lr_scales, pfc,
                               scan_steps=scan_steps,
                               scan_unroll=scan_unroll, fsdp=plan.fsdp)
    if plan.tp > 1:
        from msml_tpu.core.tensor_parallel import make_tp_train_step
        return make_tp_train_step(model, cfg, mesh, lr_scales,
                                  scan_steps=scan_steps,
                                  scan_unroll=scan_unroll)
    if plan.fsdp:
        from msml_tpu.core.fsdp import make_fsdp_train_step
        return make_fsdp_train_step(model, cfg, mesh, lr_scales,
                                    scan_steps=scan_steps,
                                    scan_unroll=scan_unroll)
    from msml_tpu.core.gspmd import (make_global_batch_step_fn,
                                     pin_first_call_jit)
    return pin_first_call_jit(make_global_batch_step_fn(model, cfg,
                                                        lr_scales),
                              mesh, scan_steps=scan_steps,
                              scan_unroll=scan_unroll)


def layout_summary(plan: Plan, state) -> str:
    """One log line describing the realized layout (cli.train)."""
    from msml_tpu.core.fsdp import sharded_fraction
    frac = sharded_fraction(state.params)
    return (f"parallelism {plan.describe()}: "
            f"{100 * frac:.0f}% of parameter bytes sharded")
