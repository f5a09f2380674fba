"""Fast unit tests for train/optim.py (torch-SGD parity + frozen groups)."""

import jax.numpy as jnp
import numpy as np

from msml_tpu.train import optim


def test_frozen_group_untouched_by_weight_decay():
    """lr-scale-0 groups (the frozen peer teacher) must be left alone —
    torch SGD never visits requires_grad=False params, so weight decay
    must not accumulate wd*p into their momentum buffers."""
    params = {"peer": {"w": jnp.ones((3,))}, "frb": {"w": jnp.ones((3,))}}
    grads = {"peer": {"w": jnp.zeros((3,))}, "frb": {"w": jnp.ones((3,))}}
    mom = optim.init_momentum(params)
    scales = {"peer": {"w": 0.0}, "frb": {"w": 0.1}}
    new_p, new_m = optim.sgd_update(params, grads, mom, scales,
                                    jnp.float32(1.0), weight_decay=5e-4)
    np.testing.assert_array_equal(np.asarray(new_p["peer"]["w"]), 1.0)
    np.testing.assert_array_equal(np.asarray(new_m["peer"]["w"]), 0.0)
    assert float(new_p["frb"]["w"][0]) != 1.0       # trainable group moved
    assert float(new_m["frb"]["w"][0]) != 0.0


def test_sgd_matches_torch_semantics():
    """g += wd*p; buf = mu*buf + g; p -= lr*buf (train.py:175-178)."""
    p0, g0, b0, lr, wd, mu = 2.0, 0.5, 0.25, 0.1, 5e-4, 0.9
    params = {"a": jnp.full((1,), p0)}
    grads = {"a": jnp.full((1,), g0)}
    mom = {"a": jnp.full((1,), b0)}
    new_p, new_m = optim.sgd_update(params, grads, mom, {"a": lr},
                                    jnp.float32(1.0), weight_decay=wd,
                                    momentum_coef=mu)
    g = g0 + wd * p0
    buf = mu * b0 + g
    np.testing.assert_allclose(float(new_m["a"][0]), buf, rtol=1e-6)
    np.testing.assert_allclose(float(new_p["a"][0]), p0 - lr * buf,
                               rtol=1e-6)
