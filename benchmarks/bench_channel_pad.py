"""Microbenchmark: channel-width padding at the iresnet layer1/2 shapes.

The round-3 roofline attributes the flagship's 28.7%-of-peak MXU efficiency
to lane underfill: C=64 at 112^2/56^2 fills half the MXU's 128 lanes. The
one untried lever (VERDICT r3 #1) is explicit channel padding — if a
64->128 conv costs the SAME device time as 64->64 (padding rides the idle
lanes for free), the underfill attribution is confirmed and a padded "wide
mode" gives free capacity; if it costs ~2x, XLA's C=64 lowering already
packs the lanes (e.g. two 64-channel tiles per pass) and the lever is dead
— channel padding can then only add work, never speed the parity model.

Times fwd / dX / dW of 3x3 convs at the two hot shapes for channel combos
(64->64, 64->128, 128->128, 64->96), bf16, B=128, using the in-jit
fori_loop harness (a host dispatch through the axon tunnel costs ~2 ms —
same order as the ops).

python benchmarks/bench_channel_pad.py
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


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def timed(fn, *args):
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


def main():
    rng = np.random.RandomState(0)
    results = {}
    for hw in (112, 56):
        base = None
        for ci, co in ((64, 64), (64, 96), (64, 128), (128, 128)):
            x = jnp.asarray(rng.randn(B, hw, hw, ci), jnp.bfloat16)
            w = jnp.asarray(rng.randn(3, 3, ci, co) * 0.05, jnp.bfloat16)
            dy = jnp.asarray(rng.randn(B, hw, hw, co), jnp.bfloat16)

            def dx(dy_, w_, x_=x):
                _, f = jax.vjp(lambda xx: conv(xx, w_), x_)
                return f(dy_)[0]

            def dw(dy_, x_, w_=w):
                _, f = jax.vjp(lambda ww: conv(x_, ww), w_)
                return f(dy_)[0]

            row = {"fwd_ms": round(timed(conv, x, w), 3),
                   "dx_ms": round(timed(dx, dy, w), 3),
                   "dw_ms": round(timed(dw, dy, x), 3)}
            row["total_ms"] = round(sum(row.values()), 3)
            flops = 2 * B * hw * hw * 9 * ci * co * 3  # fwd+dx+dw
            row["tflops_per_s"] = round(flops / row["total_ms"] / 1e9, 1)
            if (ci, co) == (64, 64):
                base = row["total_ms"]
            row["vs_64_64"] = round(row["total_ms"] / base, 2)
            results[f"{hw}x{hw} {ci}->{co}"] = row
            print(json.dumps({f"{hw}x{hw} {ci}->{co}": row}))
    return results


if __name__ == "__main__":
    main()
