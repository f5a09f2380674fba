"""Interpret-mode correctness of the archived implicit-GEMM conv kernels
(conv_gemm.py): fwd / dX (flipped weights) / dW all match lax.conv on
small shapes. The kernels are numerically right — they lost on SPEED
(0.25-0.7x XLA, see the module docstring / PERF.md r5)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import conv_gemm as cg  # noqa: E402


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _data(seed=0, B=4, H=8, W=8, Ci=4, Co=4):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, H, W, Ci), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, Ci, Co) * 0.3, jnp.float32)
    dy = jnp.asarray(rng.randn(B, H, W, Co), jnp.float32)
    return x, w, dy


def test_fwd_matches_lax_conv():
    x, w, _ = _data()
    got = cg.conv3x3_gemm(x, w, bt=2, rows=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_conv(x, w)),
                               atol=2e-5)


def test_dx_via_flipped_weights():
    x, w, dy = _data(1)
    _, f = jax.vjp(lambda xx: _conv(xx, w), x)
    want = f(dy)[0]
    got = cg.conv3x3_gemm(dy, cg.flip_weights(w), bt=2, rows=4,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_dw_matches_vjp():
    x, w, dy = _data(2)
    _, f = jax.vjp(lambda ww: _conv(x, ww), w)
    want = f(dy)[0]
    got = cg.conv3x3_gemm_dw(x, dy, bt=2, rows=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4)
