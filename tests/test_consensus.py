"""Consensus seg-loss parity vs a naive per-blob loop oracle.

The oracle below follows `tricks/consensus_loss.py:65-167` step by step in
numpy (unique-blob loop, blob-mean NLL, masked KL deviation) so the
vectorised JAX implementation can be checked bit-for-bit on binary masks.
"""

import numpy as np

from msml_tpu.losses.consensus import structure_consensus_loss


def _softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _oracle(logit_nchw, blobs, alpha=10.0, beta=5.0):
    """Naive loop implementation of consensus_loss.py:65-167 (reduce='idx')."""
    n, c, h, w = logit_nchw.shape
    total, count = 0.0, 0.0
    for s in np.unique(blobs):
        idx = blobs == s                                 # (N,H,W)
        prob = _softmax(logit_nchw, 1)
        idx_c = np.repeat(idx[:, None], c, axis=1)       # (N,C,H,W)
        prob_blob = prob * idx_c
        support = idx_c.sum(axis=(2, 3)).astype(np.float64)  # (N,C)
        mean = np.zeros((n, c))
        nz = support > 0
        mean[nz] = prob_blob.sum(axis=(2, 3))[nz] / support[nz]
        # NLL of blob mean at label s
        loss_avg = np.zeros(n)
        for i in range(n):
            if support[i, 0] == 0:
                loss_avg[i] = 0.0
            else:
                loss_avg[i] = -np.log(mean[i, int(s)])
        loss_avg = loss_avg.mean()
        # KL deviation
        nzm = prob_blob != 0
        log_x = np.zeros_like(prob_blob)
        log_x[nzm] = np.log(prob_blob[nzm])
        t = np.broadcast_to(mean[:, :, None, None], prob_blob.shape).copy()
        t[~nzm] = 1.0
        log_t = np.log(t)
        kl = t * (log_t - log_x)
        kl[~nzm] = 0.0
        loss_dev = kl.sum() / nzm.sum()
        total += alpha * loss_avg + beta * loss_dev
        count += 1
    return total / count


def test_consensus_matches_loop_oracle():
    rng = np.random.RandomState(0)
    logit = rng.randn(3, 2, 16, 16).astype(np.float64)
    blobs = (rng.rand(3, 16, 16) > 0.6).astype(np.int32)
    want = _oracle(logit, blobs)
    got = float(structure_consensus_loss(
        jnp_nhwc(logit), blobs, num_blob_ids=2))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_consensus_single_blob_batch():
    """All-clean masks: only blob 0 present -> average over one blob,
    like the reference's unique() producing a single id."""
    rng = np.random.RandomState(1)
    logit = rng.randn(2, 2, 8, 8).astype(np.float64)
    blobs = np.zeros((2, 8, 8), np.int32)
    want = _oracle(logit, blobs)
    got = float(structure_consensus_loss(jnp_nhwc(logit), blobs))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_consensus_blob_missing_in_one_sample():
    """One sample fully clean, one with occlusion: per-sample invalid
    handling (consensus_loss.py:141-143)."""
    rng = np.random.RandomState(2)
    logit = rng.randn(2, 2, 8, 8).astype(np.float64)
    blobs = np.zeros((2, 8, 8), np.int32)
    blobs[1, 2:5, 3:6] = 1
    want = _oracle(logit, blobs)
    got = float(structure_consensus_loss(jnp_nhwc(logit), blobs))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def jnp_nhwc(logit_nchw):
    import jax.numpy as jnp
    return jnp.asarray(logit_nchw.transpose(0, 2, 3, 1).astype(np.float32))
