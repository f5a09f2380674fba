"""Fused Pallas PReLU (kernels/prelu.py): forward/gradient parity with the
plain jnp implementation, via the TPU interpreter on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from prelu_pallas import _pick_tile, _plain, prelu


def _loss_plain(x, a):
    return jnp.sum(jnp.sin(_plain(x, a)))


def _loss_pallas(x, a):
    return jnp.sum(jnp.sin(prelu(x, a, force_pallas=True)))


def test_prelu_forward_matches_plain():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 8, 8, 64), jnp.float32)
    a = jnp.asarray(rng.rand(64) * 0.5, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = prelu(x, a, force_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_plain(x, a)),
                               atol=0, rtol=0)


def test_prelu_gradients_match_plain():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 4, 128), jnp.float32)
    a = jnp.asarray(rng.rand(128) * 0.5, jnp.float32)
    gx_p, ga_p = jax.grad(_loss_plain, argnums=(0, 1))(x, a)
    with pltpu.force_tpu_interpret_mode():
        gx_k, ga_k = jax.grad(_loss_pallas, argnums=(0, 1))(x, a)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_p),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ga_k), np.asarray(ga_p),
                               atol=1e-5, rtol=1e-5)


def test_prelu_gradients_multi_tile_accumulation():
    """dalpha must accumulate correctly across >1 sequential grid steps."""
    rng = np.random.RandomState(2)
    m, c = 65536, 32
    x = jnp.asarray(rng.randn(m, c), jnp.float32)
    a = jnp.asarray(rng.rand(c) * 0.5, jnp.float32)
    tile = _pick_tile(m, c)
    assert m // tile > 1  # the accumulation path is actually exercised
    gx_p, ga_p = jax.grad(_loss_plain, argnums=(0, 1))(x, a)
    with pltpu.force_tpu_interpret_mode():
        gx_k, ga_k = jax.grad(_loss_pallas, argnums=(0, 1))(x, a)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_p),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ga_k), np.asarray(ga_p),
                               atol=1e-4, rtol=1e-5)


def test_prelu_bf16_close():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(16, 64), jnp.bfloat16)
    a = jnp.asarray(rng.rand(64) * 0.5, jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got = prelu(x, a, force_pallas=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(_plain(x, a), np.float32),
                               atol=1e-2, rtol=1e-2)


def test_prelu_fallback_on_untileable_rows():
    """Odd row counts fall back to plain jnp (no padding copies)."""
    x = jnp.asarray(np.random.RandomState(4).randn(3, 5, 7), jnp.float32)
    a = jnp.asarray([0.25] * 7, jnp.float32)
    got = prelu(x, a, force_pallas=True)  # m = 15, not tileable
    np.testing.assert_allclose(np.asarray(got), np.asarray(_plain(x, a)))


def test_pick_tile_divides():
    for m in (16, 6272, 25088, 401408, 1605632):
        for c in (32, 64, 128, 256, 512):
            t = _pick_tile(m, c)
            assert m % t == 0 and t >= 1
            assert t * c <= 512 * 1024 or t == 16
