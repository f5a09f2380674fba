"""Profiling / tracing helpers.

The reference has no profiler integration (SURVEY.md §5) — throughput was its
only signal (`utils/utils_callbacks.py:68-97`). Here:
  * `trace(...)`: context manager around jax.profiler for xprof traces
  * `step_timer`: device-get-fenced step timing (through the axon TPU relay,
    block_until_ready can return early; an explicit transfer is the only
    reliable fence — see bench.py)
  * `flops_report`: XLA cost analysis of a jitted fn (the thop.profile
    analogue used at `backbones/msml.py:203-205`)
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/msml_trace"):
    """Capture an xprof trace viewable with tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def fence(x) -> float:
    """Reliable device fence: returns a scalar pulled from `x`.

    Falls back to block_until_ready when there is nothing to pull (empty
    pytree / None output) or the leaf is not fully addressable from this
    process (multihost global arrays)."""
    leaves = jax.tree.leaves(x)
    if not leaves:
        jax.block_until_ready(x)
        return 0.0
    leaf = leaves[0]
    try:
        return float(jnp.ravel(leaf)[0])
    except Exception:
        jax.block_until_ready(leaf)
        return 0.0


def step_timer(fn: Callable, *args, iters: int = 10, warmup: int = 3):
    """Time fn(*args) with a device_get fence; returns seconds/iter."""
    iters = max(int(iters), 1)
    out = None
    for _ in range(max(int(warmup), 0)):
        out = fn(*args)
    if warmup:
        fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def flops_report(fn: Callable, *example_args) -> dict:
    """FLOPs / bytes of a jitted function via XLA cost analysis."""
    lowered = jax.jit(fn).lower(*example_args)
    cost = lowered.compile().cost_analysis() or {}
    return {"gflops": cost.get("flops", float("nan")) / 1e9,
            "gbytes": cost.get("bytes accessed", float("nan")) / 1e9}
