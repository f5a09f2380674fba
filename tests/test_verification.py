"""Verification-metric parity vs sklearn/scipy — the exact libraries the
reference `eval/verification.py` is built on, used here as oracles."""

import numpy as np
import pytest

from msml_tpu.eval.verification import (LFold, calculate_roc, calculate_val,
                                        evaluate, extract_embeddings,
                                        l2_normalize_np)


def test_lfold_matches_sklearn_kfold():
    sklearn = pytest.importorskip("sklearn.model_selection")
    indices = np.arange(37)
    ours = list(LFold(n_splits=10).split(indices))
    theirs = list(sklearn.KFold(n_splits=10, shuffle=False).split(indices))
    for (tr_a, te_a), (tr_b, te_b) in zip(ours, theirs):
        np.testing.assert_array_equal(tr_a, indices[tr_b])
        np.testing.assert_array_equal(te_a, indices[te_b])


def _pairs(n=600, dim=32, seed=0):
    """Synthetic verification set: same pairs close, diff pairs far."""
    rng = np.random.RandomState(seed)
    issame = rng.rand(n) > 0.5
    e1 = l2_normalize_np(rng.randn(n, dim))
    noise = rng.randn(n, dim) * 0.3
    e2 = np.where(issame[:, None], e1 + noise * 0.3, rng.randn(n, dim))
    e2 = l2_normalize_np(e2)
    emb = np.empty((2 * n, dim))
    emb[0::2] = e1
    emb[1::2] = e2
    return emb, issame


def test_evaluate_separable_data_high_accuracy():
    emb, issame = _pairs()
    _, _, accuracy, val, val_std, far = evaluate(emb, issame)
    assert accuracy.shape == (10,)
    assert accuracy.mean() > 0.9
    assert 0.0 <= val <= 1.0


def test_calculate_val_interp_matches_scipy_slinear():
    """The reference uses scipy interp1d(kind='slinear') on the far->threshold
    curve (verification.py:151-153); our np.interp-on-sorted must agree."""
    scipy_interp = pytest.importorskip("scipy.interpolate")
    rng = np.random.RandomState(3)
    thresholds = np.arange(0, 4, 0.001)
    # build a monotonic-ish far curve like real data
    far_train = np.clip(np.sort(rng.rand(len(thresholds))), 0, 1)
    far_target = 1e-3 if far_train.max() >= 1e-3 else far_train.max() / 2
    f = scipy_interp.interp1d(far_train, thresholds, kind="slinear")
    want = float(f(far_target))
    order = np.argsort(far_train)
    got = float(np.interp(far_target, far_train[order], thresholds[order]))
    assert abs(got - want) < 1e-9


def test_extract_embeddings_overlapping_tail():
    """verification.py:259-281: last window re-reads `batch_size` rows ending
    at n; rows must land in the right output slots exactly once."""
    n, batch = 10, 4
    data = np.arange(n, dtype=np.float32)[:, None, None, None] * np.ones(
        (n, 4, 4, 3), np.float32)

    def extract(img):
        # embedding = mean pixel value per image (identifies the row)
        return img.reshape(img.shape[0], -1).mean(axis=1, keepdims=True)

    embs = extract_embeddings([data], extract, batch, is_gray=False,
                              use_norm=False)[0]
    want = (np.arange(n) / 255.0)[:, None]
    np.testing.assert_allclose(embs, want, rtol=1e-5)


def test_gray_conversion():
    """verification.py:250-254: gray = (.2989 r + .587 g + .114 b)/3."""
    data = np.full((2, 4, 4, 3), 90.0, np.float32)
    seen = {}

    def extract(img):
        seen["shape"] = img.shape
        seen["val"] = float(img[0, 0, 0, 0])
        return np.zeros((img.shape[0], 8), np.float32)

    extract_embeddings([data], extract, 2, is_gray=True, use_norm=False)
    assert seen["shape"] == (2, 4, 4, 1)
    want = 90.0 * (0.2989 + 0.5870 + 0.1140) / 3 / 255.0
    np.testing.assert_allclose(seen["val"], want, rtol=1e-5)


def test_calculate_roc_perfect_separation():
    emb1 = np.zeros((20, 4))
    emb2 = np.zeros((20, 4))
    issame = np.array([True] * 10 + [False] * 10)
    emb2[10:, 0] = 2.0  # diff pairs distance 4
    tpr, fpr, acc = calculate_roc(np.arange(0, 4, 0.01), emb1, emb2, issame,
                                  nrof_folds=5)
    assert acc.mean() == 1.0
