"""Microbenchmark: space-to-depth / slice rewrites of iresnet layer1-block0
convs (the hottest backward cluster in the round-3 flagship trace: conv1
5.4% + downsample 2.7% + conv2 2.4% of device time, all at 112^2 x 64 where
the 128-lane MXU runs half full and strided lowerings are worst).

Three semantics-preserving rewrites, each checked for exact fwd equivalence
before timing (B=128, bf16, NHWC):

  ds: 1x1 stride-2 conv  -> spatial slice x[:, ::2, ::2] + 1x1 stride-1 conv
      (identical math; removes the strided-conv lowering entirely)
  s2: 3x3 stride-2 conv  -> s2d(x) to 56^2 x 256 + 2x2 stride-1 conv with
      zero-expanded weights [2,2,4C,O] (1.78x nominal FLOPs, full MXU lanes)
  s1: 3x3 stride-1 conv  -> s2d(x) + 3x3 conv 256->256 with expanded weights
      [3,3,4C,4O] (4x nominal FLOPs; expected to lose — falsification case)

Gradients flow to the ORIGINAL [3,3,C,O] weights (expansion is in-graph),
so fwd+bwd timings include the real deployment cost.

python benchmarks/bench_s2d_conv.py
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

apply_tuned_flags()  # measure under the flags that ship (PERF.md flag sweep)
jax.config.update("jax_compilation_cache_dir",
                  flag_cache_dir("/tmp/msml_jax_cache_tpu"))

B = 128
HW = 112
C = 64
ITERS = 30


def conv(x, w, stride=1, padding=((1, 1), (1, 1))):
    """torch-style explicit padding, like msml_tpu.nn.common conv3x3/1x1."""
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d(x):
    """[B, H, W, C] -> [B, H/2, W/2, 4C]; channel order (dy, dx, c)."""
    b, h, w, c = x.shape
    return (x.reshape(b, h // 2, 2, w // 2, 2, c)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(b, h // 2, w // 2, 4 * c))


def d2s(y):
    """inverse of s2d."""
    b, h, w, c4 = y.shape
    c = c4 // 4
    return (y.reshape(b, h, w, 2, 2, c)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(b, 2 * h, 2 * w, c))


def expand_w_s2(w):
    """[3,3,C,O] -> [2,2,4C,O] for: 3x3 stride-2 torch-pad-1 conv on
    [2H,2W,C] == 2x2 conv, padding ((1,0),(1,0)), on s2d input [H,W,4C].

    With pad 1, y[i,j] = sum_{u,v in 0..2} w[u,v] x[2i+u-1, 2j+v-1]; the
    read offsets 2i-1, 2i, 2i+1 span s2d blocks {i-1, i}, a 2-tap block
    kernel whose (k=0, dy=0) slot is structurally zero: front-pad w to
    [4,4,C,O] so index a = u+1 = 2k+dy maps each tap in place."""
    c, o = w.shape[2], w.shape[3]
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))     # [4,4,C,O]
    return (wp.reshape(2, 2, 2, 2, c, o)
              .transpose(0, 2, 1, 3, 4, 5)                # bu,bv,du,dv,c,o
              .reshape(2, 2, 4 * c, o))


def expand_w_s1(w):
    """[3,3,C,O] -> [3,3,4C,4O] for: 3x3 stride-1 SAME conv on [2H,2W,C]
    == 3x3 SAME conv 4C->4O on s2d input, output in s2d layout.

    y'[i,j,(ry,rx,o)] = sum_{u,v} w[u+1,v+1] x[2i+ry+u, 2j+rx+v]; writing
    ry+u = 2*(bu-1) + du + 1 gives a 3x3 block kernel where slot
    (bu,du,ry) is live iff u = 2*(bu-1)+du-ry is in [-1,1]."""
    c, o = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 2, 2, c, 2, 2, o), w.dtype)  # bu,bv,du,dv,c,ry,rx,o
    for bu in range(3):
        for du in range(2):
            for ry in range(2):
                u = 2 * (bu - 1) + du - ry
                if not -1 <= u <= 1:
                    continue
                for bv in range(3):
                    for dv in range(2):
                        for rx in range(2):
                            v = 2 * (bv - 1) + dv - rx
                            if not -1 <= v <= 1:
                                continue
                            out = out.at[bu, bv, du, dv, :, ry, rx, :].set(
                                w[u + 1, v + 1])
    return out.reshape(3, 3, 4 * c, 4 * o)


def timed(fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn_j(*args)
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def fwd_bwd(fn):
    def loss(x, w):
        return jnp.sum(fn(x, w).astype(jnp.float32) ** 2)
    return jax.grad(loss, argnums=(0, 1))


def check(name, a, b, tol=0.1):
    """bf16 guard only (1-ulp reordering noise at |y|~8 is 0.0625); exact
    f32 equivalence incl. gradients is proven at small shapes on CPU."""
    d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    assert d < tol, (name, d)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, HW, HW, C), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(1, 1, C, C) * 0.05, jnp.bfloat16)
    w3 = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.bfloat16)

    # --- ds: 1x1 stride-2 (pad 0: reads x[2i, 2j] only) ---
    ds_direct = lambda x, w: conv(x, w, stride=2, padding=((0, 0), (0, 0)))
    ds_slice = lambda x, w: conv(x[:, ::2, ::2, :], w, stride=1,
                                 padding=((0, 0), (0, 0)))
    check("ds", ds_direct(x, w1), ds_slice(x, w1))

    # --- s2: 3x3 stride-2, torch pad 1 ---
    s2_direct = lambda x, w: conv(x, w, stride=2)
    s2_s2d = lambda x, w: conv(s2d(x), expand_w_s2(w), stride=1,
                               padding=((1, 0), (1, 0)))
    check("s2", s2_direct(x, w3), s2_s2d(x, w3))

    # --- s1: 3x3 stride-1 ---
    s1_direct = lambda x, w: conv(x, w, stride=1)
    s1_s2d = lambda x, w: d2s(conv(s2d(x), expand_w_s1(w), stride=1))
    check("s1", s1_direct(x, w3), s1_s2d(x, w3))

    # --- stem: 3x3 stride-1, C_in=3 (the image conv) ---
    xs = jnp.asarray(rng.randn(B, HW, HW, 3), jnp.bfloat16)
    wst = jnp.asarray(rng.randn(3, 3, 3, C) * 0.05, jnp.bfloat16)
    check("stem", s1_direct(xs, wst), s1_s2d(xs, wst))

    rows = {}
    for name, direct, rewrite, xd, wd in [
            ("ds_1x1_s2", ds_direct, ds_slice, x, w1),
            ("s2_3x3_s2", s2_direct, s2_s2d, x, w3),
            ("s1_3x3_s1", s1_direct, s1_s2d, x, w3),
            ("stem_3x3_s1_cin3", s1_direct, s1_s2d, xs, wst)]:
        r = {"fwd_direct_ms": round(timed(direct, xd, wd), 3),
             "fwd_rewrite_ms": round(timed(rewrite, xd, wd), 3),
             "bwd_direct_ms": round(timed(fwd_bwd(direct), xd, wd), 3),
             "bwd_rewrite_ms": round(timed(fwd_bwd(rewrite), xd, wd), 3)}
        r["fwd_speedup"] = round(r["fwd_direct_ms"] / r["fwd_rewrite_ms"], 3)
        r["bwd_speedup"] = round(r["bwd_direct_ms"] / r["bwd_rewrite_ms"], 3)
        rows[name] = r
        print(json.dumps({name: r}))


if __name__ == "__main__":
    main()
