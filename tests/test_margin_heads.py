"""Margin-head numerics vs the reference formulas.

The oracle re-derives AMCosFace / AMArcFace in torch exactly as specified in
`headers/margin_losses.py:241-418` (logit cos(theta)-m+k(theta-a) resp.
cos(theta+m-k(theta-a)), label==-1 rows untouched), using the reference's own
__main__ fixture (margin_losses.py:431-439): a 6x8 cosine matrix with labels
[-1, 4, -1, 5, 3, -1].
"""

import numpy as np
import pytest

from msml_tpu.heads.margin import amarc_margin, amcos_margin, cosine_logits


def _fixture():
    rng = np.random.RandomState(0)
    cosine = rng.randn(6, 8).astype(np.float32) / 100
    cosine[0][2] = 0.3
    cosine[1][4] = 0.4
    cosine[2][6] = 0.5
    cosine[3][5] = 0.6
    cosine[4][3] = 0.7
    cosine[5][0] = 0.8
    label = np.array([-1, 4, -1, 5, 3, -1], dtype=np.int32)
    return cosine, label


def _oracle_amcos(cosine, label, s, m, a, k):
    out = cosine.astype(np.float64).copy()
    for i in range(len(label)):
        if label[i] == -1:
            continue
        y = label[i]
        theta = np.arccos(np.clip(out[i, y], -1, 1))
        out[i, y] -= m - k * (theta - a)
    return out * s


def _oracle_amarc(cosine, label, s, m, a, k):
    c = cosine.astype(np.float64).copy()
    theta = np.arccos(np.clip(c, -1, 1))
    for i in range(len(label)):
        if label[i] == -1:
            continue
        y = label[i]
        theta[i, y] += m - k * (np.arccos(np.clip(c[i, y], -1, 1)) - a)
    return np.cos(theta) * s


@pytest.mark.parametrize("s,m,a,k", [(1.0, 0.35, 1.2, 0.1),
                                     (64.0, 0.4, 0.0, 0.0)])
def test_amcos_matches_reference_formula(s, m, a, k):
    cosine, label = _fixture()
    got = np.asarray(amcos_margin(cosine, label, s, m, a, k))
    want = _oracle_amcos(cosine, label, s, m, a, k)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("s,m,a,k", [(1.0, 0.5, 1.2, 0.1),
                                     (64.0, 0.48, 0.0, 0.0)])
def test_amarc_matches_reference_formula(s, m, a, k):
    cosine, label = _fixture()
    got = np.asarray(amarc_margin(cosine, label, s, m, a, k))
    want = _oracle_amarc(cosine, label, s, m, a, k)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_amarc_invalid_rows_passthrough():
    """label==-1 rows come back as s * cosine (margin_losses.py:390-418)."""
    cosine, label = _fixture()
    got = np.asarray(amarc_margin(cosine, label, 64.0, 0.5, 0.0, 0.0))
    for i in np.where(label == -1)[0]:
        np.testing.assert_allclose(got[i], 64.0 * cosine[i],
                                   rtol=1e-4, atol=1e-4)


def test_cosine_logits_matches_torch_linear_normalize():
    """cosine_logits == F.linear(F.normalize(e), F.normalize(W))
    (margin_losses.py:256,371)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    emb = rng.randn(4, 16).astype(np.float32)
    w = rng.randn(10, 16).astype(np.float32)
    want = F.linear(F.normalize(torch.from_numpy(emb)),
                    F.normalize(torch.from_numpy(w))).numpy()
    got = np.asarray(cosine_logits(emb, w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_l2_normalize_zero_vector_gradient_finite():
    """torch F.normalize parity at the degenerate point: a zero embedding
    (per-device batch 1 makes the feature BN emit exactly zero) must give
    finite gradients, like torch's zero subgradient of norm at 0 — the
    naive maximum(norm, eps) form NaNs in JAX (0 * inf chain rule)."""
    import jax
    import jax.numpy as jnp

    from msml_tpu.heads.margin import l2_normalize

    x = jnp.zeros((3, 8), jnp.float32)
    g = jax.grad(lambda v: l2_normalize(v).sum())(x)
    assert np.isfinite(np.asarray(g)).all()
    # and values away from 0 are unchanged vs the definition
    y = jnp.asarray(np.random.RandomState(0).randn(4, 8), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(l2_normalize(y)),
        np.asarray(y) / np.linalg.norm(y, axis=-1, keepdims=True),
        rtol=1e-6)
