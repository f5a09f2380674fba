"""Microbenchmark: can merging two same-shape conv streams into one op
raise MXU fill at iresnet18's small channel widths?

Context (VERDICT r2 #4): the peer_dec config runs a frozen teacher
(iresnet18) next to the student (iresnet18) — identical stage shapes,
different weights. A single conv cannot serve both batches, but a
feature_group_count=2 grouped conv with block-diagonal weights computes
both streams in ONE op; if XLA packs both groups' 64-channel outputs into
the 128 MXU lanes, the merged op could approach the cost of one stream.

Measures, per stage shape (B=128):
  sep:     two sequential convs (the current peer implementation)
  grouped: one grouped conv on channel-concat inputs, fgc=2
  batched: one conv on batch-concat (2B) with ONE weight set — the
           perfect-merge upper bound (not semantically valid for
           teacher+student, shown for headroom only)

python benchmarks/bench_grouped_conv.py
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
STAGES = [(56, 64), (28, 128), (14, 256), (7, 512)]
ITERS = 30


def conv(x, w, fgc=1, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=fgc)


def timed(fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn_j(*args)
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    rng = np.random.RandomState(0)
    rows = []
    for hw, c in STAGES:
        xa = jnp.asarray(rng.randn(B, hw, hw, c), jnp.bfloat16)
        xb = jnp.asarray(rng.randn(B, hw, hw, c), jnp.bfloat16)
        wa = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, jnp.bfloat16)
        wb = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, jnp.bfloat16)
        # block-diagonal grouped weight: group g sees only its own channels
        wg = jnp.concatenate([wa, wb], axis=3)  # HWI(2O) with fgc=2 splits I
        xcat = jnp.concatenate([xa, xb], axis=3)
        xbatch = jnp.concatenate([xa, xb], axis=0)

        t_sep = timed(lambda a, b, w1, w2: (conv(a, w1), conv(b, w2)),
                      xa, xb, wa, wb)
        t_grp = timed(lambda x, w: conv(x, w, fgc=2), xcat, wg)
        t_bat = timed(lambda x, w: conv(x, w), xbatch, wa)
        rows.append({"hw": hw, "c": c, "sep_ms": round(t_sep, 3),
                     "grouped_ms": round(t_grp, 3),
                     "batched_1w_ms": round(t_bat, 3),
                     "grouped_speedup": round(t_sep / t_grp, 3)})
        print(json.dumps(rows[-1]))
    print(json.dumps({"verdict": "grouped wins" if all(
        r["grouped_speedup"] > 1.1 for r in rows[:2]) else
        "grouped does not win at the small-channel stages"}))


if __name__ == "__main__":
    main()
