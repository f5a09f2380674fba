"""Fused per-channel PReLU as a Pallas TPU kernel with a custom VJP.

Why: PReLU is MSML's ubiquitous activation (~30 sites: every iResNet block,
FM bottleneck, U-Net encoder — reference `backbones/frb/iresnet.py:50-57`,
`backbones/fm/fmoperator.py:43-60`). Under autodiff, XLA computes the
per-channel alpha gradient as a standalone full-resolution f32 `reduce_sum`
pass per site (measured 2.6 ms of the 41.6 ms flagship step on v5e — the
single largest non-conv cost, see PERF.md). This kernel fuses the backward
into ONE pass over (g, x): dx is written while dalpha accumulates in an f32
VMEM block across the sequential TPU grid, cutting the PReLU backward HBM
traffic from 5 array-passes to 3.

Forward math is bit-identical to the flax module (`nn/common.py::PReLU`):
y = where(x >= 0, x, alpha * x), computed in x.dtype.

Dispatch: `prelu(x, alpha)` uses the kernel on TPU when the flattened row
count is tileable, otherwise falls back to plain jnp (CPU tests run the
fallback; the kernel itself is covered in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np


def _plain(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, alpha * x)


def _pick_tile(m: int, c: int) -> int:
    """Largest power-of-two row tile dividing m, sized to keep the backward
    working set (g, x, dx blocks, double-buffered across grid steps) inside
    the 16 MB VMEM. Lanes pad to 128, so budget against max(c, 128)."""
    cap = max(128 * 1024 // max(c, 128), 16)  # <= ~256 KB per bf16 block
    tile = 1
    while tile * 2 <= cap and m % (tile * 2) == 0:
        tile *= 2
    return tile


def _fwd_kernel(x_ref, a_ref, y_ref):
    x = x_ref[:]
    # comparison in f32: v5e Mosaic rejects bf16 compares
    pos = x.astype(jnp.float32) >= 0
    y_ref[:] = jnp.where(pos, x, a_ref[:] * x)


def _bwd_kernel(g_ref, x_ref, a_ref, dx_ref, da_ref):
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    i = pl.program_id(0)
    g = g_ref[:]
    x = x_ref[:]
    neg = x.astype(jnp.float32) < 0  # f32 compare (v5e Mosaic)
    dx_ref[:] = jnp.where(neg, g * a_ref[:], g)
    contrib = jnp.sum(
        jnp.where(neg, (g * x), 0).astype(jnp.float32), axis=0,
        keepdims=True)

    @pl.when(i == 0)
    def _init():
        da_ref[:] = jnp.zeros_like(da_ref)

    da_ref[:] += contrib


def _pallas_fwd(x2d: jnp.ndarray, a2d: jnp.ndarray, tile: int) -> jnp.ndarray:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, c = x2d.shape
    # under shard_map(check_vma=True) outputs must carry the input's
    # varying-mesh-axes set; outside shard_map this is the empty frozenset
    vma = getattr(jax.typeof(x2d), "vma", frozenset())
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((m, c), x2d.dtype, vma=vma),
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x2d, a2d)


def _pallas_bwd(g2d: jnp.ndarray, x2d: jnp.ndarray, a2d: jnp.ndarray,
                tile: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, c = x2d.shape
    vma = getattr(jax.typeof(x2d), "vma", frozenset())
    dx, da = pl.pallas_call(
        _bwd_kernel,
        out_shape=(jax.ShapeDtypeStruct((m, c), x2d.dtype, vma=vma),
                   jax.ShapeDtypeStruct((1, c), jnp.float32, vma=vma)),
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
    )(g2d, x2d, a2d)
    return dx, da


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _prelu2d(x2d, a2d, tile):
    return _pallas_fwd(x2d, a2d, tile)


def _prelu2d_fwd(x2d, a2d, tile):
    return _pallas_fwd(x2d, a2d, tile), (x2d, a2d)


def _prelu2d_bwd(tile, res, g):
    x2d, a2d = res
    dx, da = _pallas_bwd(g, x2d, a2d, tile)
    return dx, da.astype(a2d.dtype)


_prelu2d.defvjp(_prelu2d_fwd, _prelu2d_bwd)


def prelu_kernel_available() -> bool:
    try:
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    except ImportError:
        return False
    return jax.default_backend() == "tpu"


def prelu(x: jnp.ndarray, alpha: jnp.ndarray,
          force_pallas: bool = False) -> jnp.ndarray:
    """Per-channel PReLU over the trailing axis. alpha: (C,), same dtype as
    the computation (the flax module casts its f32 param before calling)."""
    c = x.shape[-1]
    m = int(np.prod(x.shape[:-1]))
    if not (force_pallas or prelu_kernel_available()) or m % 16 != 0:
        return _plain(x, alpha)
    tile = _pick_tile(m, c)
    if tile < 16:
        return _plain(x, alpha)
    x2d = x.reshape(m, c)
    a2d = alpha.reshape(1, c).astype(x.dtype)
    return _prelu2d(x2d, a2d, tile).reshape(x.shape)
