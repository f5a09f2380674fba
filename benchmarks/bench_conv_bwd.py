"""Microbenchmark: phase-decomposed (sub-pixel) rewrites of the strided-conv
INPUT gradients in the iresnet layer1-block0 backward cluster (conv1 5.4% +
downsample 2.7% + conv2 2.4% of flagship device time; the round-3 trace shows
the dilated backward lowering at ~10% MXU / ~26% HBM — bound by neither roof).

XLA computes dX of a stride-2 conv as an input-dilated conv (half the MACs
multiply structural zeros, strided access). The sub-pixel decomposition
computes all four output phases with ONE stride-1 conv over dy with a packed
[2,2,O,4C] kernel (only live taps populated), then depth-to-space interleaves
— no input dilation, 4x fewer nominal MACs, and the 4C output dim fills the
128 MXU lanes that C=64 leaves half-empty.

    y[i] = sum_u w[u] x[2i+u-1]            (stride 2, pad 1, K=3, per dim)
    dX[2m]   = w[1] dy[m]                  (even phase: 1 tap)
    dX[2m+1] = w[2] dy[m] + w[0] dy[m+1]   (odd phase: 2 taps)

Each rewrite is verified against jax.vjp of the direct conv before timing.
dW timings are included for attribution (is dX or dW the pig?).

python benchmarks/bench_conv_bwd.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msml_tpu.core.tpu_flags import apply_tuned_flags, flag_cache_dir  # noqa: E402

apply_tuned_flags()
jax.config.update("jax_compilation_cache_dir",
                  flag_cache_dir("/tmp/msml_jax_cache_tpu"))

B = 128
ITERS = 30


def conv(x, w, stride=1, pad=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def d2s(y):
    """[B,H,W,4C] (channel order a,b,c) -> [B,2H,2W,C]."""
    b, h, w, c4 = y.shape
    c = c4 // 4
    return (y.reshape(b, h, w, 2, 2, c)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(b, 2 * h, 2 * w, c))


def pack_dx_kernel_3x3_s2(w):
    """[3,3,Ci,Co] -> [2,2,Co,4Ci] packed sub-pixel dX kernel.

    Phase (a,b) of dX reads dy taps (du,dv) with weight w[u,v] where
    row a=0: (du=0, u=1); row a=1: (du=0, u=2) and (du=1, u=0); same per
    column. Kernel output channel order is (a, b, ci) to match d2s.
    """
    co = w.shape[3]
    ci = w.shape[2]
    taps = {0: [(0, 1)], 1: [(0, 2), (1, 0)]}  # a -> [(du, u)]
    wt = jnp.transpose(w, (0, 1, 3, 2))  # [u,v,co,ci]
    # kernel[du, dv, co, (a, b, ci)] — phase (a,b) only reads its live taps
    kk = jnp.zeros((2, 2, co, 2, 2, ci), w.dtype)
    for a in (0, 1):
        for b in (0, 1):
            for du, u in taps[a]:
                for dv, v in taps[b]:
                    kk = kk.at[du, dv, :, a, b, :].set(wt[u, v])
    return kk.reshape(2, 2, co, 4 * ci)


def dx_3x3_s2_subpixel(dy, w):
    """dX of conv3x3 stride-2 pad-1 on [B,2H,2W,C] via one stride-1 conv."""
    kk = pack_dx_kernel_3x3_s2(w)
    dyp = jnp.pad(dy, ((0, 0), (0, 1), (0, 1), (0, 0)))
    z = jax.lax.conv_general_dilated(
        dyp, kk, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return d2s(z)


def dx_1x1_s2_subpixel(dy, w):
    """dX of conv1x1 stride-2 pad-0: phase (0,0) = dy @ w^T, rest zero."""
    co, ci = w.shape[2], w.shape[3]
    z = jax.lax.conv_general_dilated(
        dy, jnp.transpose(w, (0, 1, 3, 2)), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b, h, ww = z.shape[0], z.shape[1], z.shape[2]
    out = jnp.zeros((b, h, ww, 4, co), z.dtype)
    out = out.at[:, :, :, 0, :].set(z)
    return d2s(out.reshape(b, h, ww, 4 * co))


def timed(fn, *args):
    """Per-op device time. A Python dispatch loop through the axon tunnel
    costs ~2 ms PER CALL — same order as the ops measured — so the op loops
    INSIDE one jit: each iteration perturbs the first arg with a scalar
    carried from the previous output (a data dependency that defeats CSE and
    forces sequential execution; the scalar add costs one read+write of the
    first arg, identical across all variants)."""
    first, rest = args[0], args[1:]

    @jax.jit
    def loop(first, *rest):
        def body(_, c):
            o = fn(first + c.astype(first.dtype), *rest)
            return jnp.ravel(o)[0].astype(jnp.float32) * 1e-12
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    out = loop(first, *rest)
    float(out)
    t0 = time.perf_counter()
    out = loop(first, *rest)
    float(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def vjp_x(convfn, x, w):
    _, f = jax.vjp(lambda xx: convfn(xx, w), x)
    return lambda dy: f(dy)[0]


def vjp_w(convfn, x, w):
    _, f = jax.vjp(lambda ww: convfn(x, ww), w)
    return lambda dy: f(dy)[0]


def check(name, a, b, tol=0.15):
    d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    assert d < tol, (name, d)


def bench_shape(name, hw, ci, co, ksize, stride, rng):
    x = jnp.asarray(rng.randn(B, hw, hw, ci), jnp.bfloat16)
    w = jnp.asarray(rng.randn(ksize, ksize, ci, co) * 0.05, jnp.bfloat16)
    pad = 1 if ksize == 3 else 0
    cf = lambda xx, ww: conv(xx, ww, stride=stride, pad=pad)
    dy = jnp.asarray(rng.randn(*cf(x, w).shape), jnp.bfloat16)

    dx_fn = vjp_x(cf, x, w)
    dw_fn = vjp_w(cf, x, w)
    row = {"dx_direct_ms": round(timed(dx_fn, dy), 3),
           "dw_direct_ms": round(timed(dw_fn, dy), 3),
           "fwd_ms": round(timed(cf, x, w), 3)}

    if stride == 2:
        sub = (dx_3x3_s2_subpixel if ksize == 3 else dx_1x1_s2_subpixel)
        check(name, dx_fn(dy), sub(dy, w))
        row["dx_subpixel_ms"] = round(timed(sub, dy, w), 3)
        row["dx_speedup"] = round(row["dx_direct_ms"] / row["dx_subpixel_ms"], 3)
    print(json.dumps({name: row}))
    return row


def main():
    rng = np.random.RandomState(0)
    # layer1 block0 trio (112^2, 64ch) + layer2 entry (56^2, 64->128)
    bench_shape("l1_conv1_3x3_s1", 112, 64, 64, 3, 1, rng)
    bench_shape("l1_conv2_3x3_s2", 112, 64, 64, 3, 2, rng)
    bench_shape("l1_ds_1x1_s2", 112, 64, 64, 1, 2, rng)
    bench_shape("l2_conv2_3x3_s2", 56, 128, 128, 3, 2, rng)
    bench_shape("l2_ds_1x1_s2", 56, 64, 128, 1, 2, rng)


if __name__ == "__main__":
    main()
