"""Post-training int8 quantization (PTQ) of inference functions.

TPU v5e executes s8 x s8 -> s32 matmuls/convs at twice the bf16 MXU rate
(394 vs 197 TOPS). On the flagship MSML graph the measured end-to-end
effect is small (+3.4% at batch 128, -6.7% at 512 — PERF.md: the eval
forward is HBM-bandwidth-bound at iresnet18's channel widths, and the
dynamic quantize/dequant passes add traffic that offsets the MXU-rate
win), so the durable value here is memory: int8 weight constants shrink
the export artifact and the executable's weight HBM ~4x. The reference
has no quantization story at all (its eval scripts run fp32/AMP torch;
`eval/qeval_mxnet.py`), so this is a beyond-parity capability either way.

Design — a jaxpr-level graph transform, not a module rewrite:

- `quantize_fn(fn)` traces `fn` to a jaxpr and re-interprets it, replacing
  every eligible `conv_general_dilated` / `dot_general` equation with an
  int8 quantize -> integer op -> dequantize sequence. Every model in the
  zoo (MSML, iResNet, LightCNN, U-Net, baselines) is covered without
  touching a single flax module, and the transform composes with
  `jax.jit` / `jax.export` (weights fold to int8 constants at compile
  time, so an exported artifact also shrinks ~4x).
- **Weights**: symmetric per-output-channel int8 scales (the standard PTQ
  recipe; per-channel costs nothing on the MXU and removes the dominant
  quantization error mode for convs).
- **Activations**: symmetric *dynamic per-sample* scales (amax over each
  sample's non-batch axes, computed on device). Per-sample rather than
  per-batch so a request's embedding does not depend on which other
  requests the serving batcher packed it with — dynamic-batching servers
  (cli/serve.py) need bit-stable answers under re-batching. The amax
  reductions are elementwise-fused by XLA into the surrounding dequant
  ops; no calibration pass or state is needed.
- **Skip rules**: ops whose contraction dimension is tiny (e.g. the
  C_in=3 stem conv, 27-wide) stay in the original dtype — they carry a
  large share of the numerical sensitivity and none of the FLOPs.

The interpreter recurses through inner `jit`/`pjit`/`remat`/`custom_jvp`
calls so quantization reaches convs wherever flax buried them.

Usage:
    qfwd = jax.jit(quantize_fn(lambda x: model.apply(v, x, train=False)[0]))

No reference counterpart (new capability); serving integration in
`cli/serve.py --quant int8`, artifact export in `tools/export_serving.py`.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.extend import core as jexc

# int8 symmetric range; 127 (not 128) keeps the grid symmetric so that
# -x quantizes to -q(x) and the zero point is exactly representable.
_QMAX = 127.0
# floor on dynamic scales: an all-zero tensor (e.g. the serving batcher's
# zero padding rows) must not produce inf/nan on dequant.
_EPS = 1e-12

# primitives we recurse into (their params carry an inner jaxpr; remat2
# carries an *open* Jaxpr with no consts, the rest a ClosedJaxpr)
_CALL_PRIMS = ("jit", "pjit", "closed_call", "core_call", "remat",
               "remat2", "checkpoint", "custom_jvp_call", "custom_vjp_call",
               "custom_vjp_call_jaxpr")


def _closed_jaxpr_param(eqn):
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        cj = eqn.params.get(key)
        if isinstance(cj, jexc.ClosedJaxpr):
            return cj
        if isinstance(cj, jexc.Jaxpr) and not cj.constvars:
            return jexc.ClosedJaxpr(cj, ())
    return None


def _expand(scale: jnp.ndarray, ndim: int, axis: int) -> jnp.ndarray:
    """Reshape a 1-D per-channel scale for broadcasting along `axis`."""
    shape = [1] * ndim
    shape[axis] = scale.shape[0]
    return scale.reshape(shape)


def _quant_weight(w, out_axis: int):
    """Symmetric per-output-channel int8: returns (int8 w, f32 scales).

    Concrete (non-tracer) weights — the usual case, since params enter as
    jaxpr consts — are folded eagerly in numpy, outside any ambient trace:
    the staged graph then embeds int8 constants directly (the f32 const
    goes dead), so `jax.export` artifacts and compiled-executable HBM both
    shrink ~4x. Traced weights take the staged-op path."""
    if isinstance(w, jax.core.Tracer):
        wf = w.astype(jnp.float32)
        axes = tuple(d for d in range(w.ndim) if d != out_axis)
        sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=axes) / _QMAX, _EPS)
        wq = jnp.clip(jnp.round(wf / _expand(sw, w.ndim, out_axis)),
                      -_QMAX, _QMAX).astype(jnp.int8)
        return wq, sw
    import numpy as np
    wf = np.asarray(w, np.float32)
    axes = tuple(d for d in range(wf.ndim) if d != out_axis)
    sw = np.maximum(np.max(np.abs(wf), axis=axes) / _QMAX, _EPS)
    shape = [1] * wf.ndim
    shape[out_axis] = sw.shape[0]
    wq = np.clip(np.round(wf / sw.reshape(shape)),
                 -_QMAX, _QMAX).astype(np.int8)
    return wq, sw.astype(np.float32)


def _quant_act(x: jnp.ndarray, batch_axis: int | None):
    """Symmetric dynamic int8 activations: returns (int8 x, scale).

    batch_axis=None -> one per-tensor scale; otherwise one scale per
    sample along that axis (shape (N,))."""
    xf = x.astype(jnp.float32)
    if batch_axis is None:
        sx = jnp.max(jnp.abs(xf)) / _QMAX
        sx = jnp.maximum(sx, _EPS)
        bc = sx
    else:
        axes = tuple(d for d in range(x.ndim) if d != batch_axis)
        sx = jnp.max(jnp.abs(xf), axis=axes) / _QMAX
        sx = jnp.maximum(sx, _EPS)
        bc = _expand(sx, x.ndim, batch_axis)
    xq = jnp.clip(jnp.round(xf / bc), -_QMAX, _QMAX).astype(jnp.int8)
    return xq, sx


def _conv_contraction(eqn) -> int:
    """kh * kw * C_in of a conv eqn — the reduction width one output
    element sums over (decides both MXU payoff and noise averaging)."""
    dn = eqn.params["dimension_numbers"]
    w_shape = eqn.invars[1].aval.shape
    size = w_shape[dn.rhs_spec[1]]
    for d in dn.rhs_spec[2:]:
        size *= w_shape[d]
    return size


def _q_conv(eqn, invals, min_contract: int):
    x, w = invals
    if (_conv_contraction(eqn) < min_contract
            or eqn.params["batch_group_count"] != 1
            or not jnp.issubdtype(eqn.outvars[0].aval.dtype, jnp.floating)):
        return None  # caller falls back to the original op
    dn = eqn.params["dimension_numbers"]
    wq, sw = _quant_weight(w, out_axis=dn.rhs_spec[0])
    xq, sx = _quant_act(x, batch_axis=dn.lhs_spec[0])
    params = dict(eqn.params)
    params["preferred_element_type"] = jnp.int32
    params["precision"] = None
    y = eqn.primitive.bind(xq, wq, **params)
    scale = (_expand(sx, y.ndim, dn.out_spec[0])
             * _expand(sw, y.ndim, dn.out_spec[1]))
    return (y.astype(jnp.float32) * scale).astype(eqn.outvars[0].aval.dtype)


def _q_dot(eqn, invals, min_contract: int):
    """Quantize rank-2 `x @ w` dots (the fc layers). General dot_generals
    (batched, multi-contraction) fall back to the original op — none of
    the zoo's inference graphs contain one."""
    x, w = invals
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    if (x.ndim != 2 or w.ndim != 2 or lb or rb
            or tuple(lc) != (1,) or tuple(rc) != (0,)
            or not jnp.issubdtype(eqn.outvars[0].aval.dtype, jnp.floating)
            or x.shape[1] < min_contract):
        return None
    wq, sw = _quant_weight(w, out_axis=1)
    xq, sx = _quant_act(x, batch_axis=0)
    params = dict(eqn.params)
    params["preferred_element_type"] = jnp.int32
    params["precision"] = None
    y = eqn.primitive.bind(xq, wq, **params)
    scale = sx[:, None] * sw[None, :]
    return (y.astype(jnp.float32) * scale).astype(eqn.outvars[0].aval.dtype)


def _interpret(closed: jexc.ClosedJaxpr, args, *, min_contract: int,
               quantize_dot: bool, stats: dict | None):
    jaxpr = closed.jaxpr
    env: dict = {}

    def read(v):
        return v.val if isinstance(v, jexc.Literal) else env[v]

    for var, const in zip(jaxpr.constvars, closed.consts):
        env[var] = const
    for var, arg in zip(jaxpr.invars, args):
        env[var] = arg

    for eqn in jaxpr.eqns:
        invals = [read(v) for v in eqn.invars]
        name = eqn.primitive.name
        out = None
        if name == "conv_general_dilated":
            out = _q_conv(eqn, invals, min_contract)
            if stats is not None:
                stats["conv_quantized" if out is not None
                      else "conv_kept"] += 1
        elif name == "dot_general" and quantize_dot:
            out = _q_dot(eqn, invals, min_contract)
            if stats is not None:
                stats["dot_quantized" if out is not None
                      else "dot_kept"] += 1
        elif name in _CALL_PRIMS:
            inner = _closed_jaxpr_param(eqn)
            if inner is not None:
                outs = _interpret(inner, invals, min_contract=min_contract,
                                  quantize_dot=quantize_dot, stats=stats)
                for var, val in zip(eqn.outvars, outs):
                    env[var] = val
                continue
        if out is not None:
            env[eqn.outvars[0]] = out
            continue
        outs = eqn.primitive.bind(*invals, **eqn.params)
        if not eqn.primitive.multiple_results:
            outs = [outs]
        for var, val in zip(eqn.outvars, outs):
            env[var] = val

    return [read(v) for v in jaxpr.outvars]


def quantize_fn(fn: Callable, *, min_contract: int = 64,
                quantize_dot: bool = True,
                stats_out: dict | None = None) -> Callable:
    """Return `fn` with eligible convs/dots rewritten to int8.

    The wrapper re-traces per input shape/dtype signature (cached), so jit
    it like any other function. `min_contract` is the minimum reduction
    width (kh*kw*C_in) an op needs before it is quantized; `stats_out`, if
    given, receives op counts from each trace (testing hook).
    """
    cache: dict = {}

    def wrapped(*args):
        leaves, in_tree = jax.tree.flatten(args)
        sig = (in_tree,
               tuple((jnp.shape(l), jnp.result_type(l)) for l in leaves))
        if sig not in cache:
            closed = jax.make_jaxpr(fn)(*args)
            out_tree = jax.tree.structure(jax.eval_shape(fn, *args))
            cache[sig] = (closed, out_tree)
        closed, out_tree = cache[sig]
        stats = None if stats_out is None else {
            "conv_quantized": 0, "conv_kept": 0,
            "dot_quantized": 0, "dot_kept": 0}
        outs = _interpret(closed, leaves, min_contract=min_contract,
                          quantize_dot=quantize_dot, stats=stats)
        if stats is not None:
            stats_out.clear()
            stats_out.update(stats)
        return jax.tree.unflatten(out_tree, outs)

    return wrapped
