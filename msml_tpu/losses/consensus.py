"""Structure-via-consensus segmentation loss (CVPR'20).

Parity target: `tricks/consensus_loss.py:28-179` with alpha=10, beta=5,
reduce='idx' (the configuration the reference trains with, `train.py:229`).

The reference loops over `torch.unique(blobs)` — data-dependent Python control
flow that cannot live under jit. Here the blob ids are a *static* enumeration
(0..num_blob_ids-1; the training masks are binary occlusion maps, blobs ==
target, `train.py:255-258`), each blob's loss is computed with fixed-shape
masked reductions, and absent blobs are handled exactly like the reference's
unique() skip: a presence indicator weights the per-blob average.

Per blob s (consensus_loss.py:97-167):
  prob            = softmax(logit, channel)
  prob_blob       = prob * [blobs == s]
  prob_blob_mean  = per-(n,c) blob-mean of prob (0 where the sample lacks s)
  loss_avg        = mean_n of -log prob_blob_mean[n, s], 0 for samples
                    without the blob
  loss_dev        = sum of t*(log t - log x) over in-blob pixels / #in-blob
                    entries, with t = prob_blob_mean broadcast
  loss_s          = alpha * loss_avg + beta * loss_dev
total = sum_s present(s) * loss_s / sum_s present(s)

Layout: NHWC — logit (N, H, W, C), blobs/target (N, H, W) integer maps.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.nn import softmax


def _blob_loss(prob: jnp.ndarray, idx_blob: jnp.ndarray, s: int,
               alpha: float, beta: float) -> jnp.ndarray:
    n, h, w, c = prob.shape
    idx = idx_blob[..., None].astype(prob.dtype)            # (N,H,W,1)
    prob_blob = prob * idx                                   # (N,H,W,C)
    support = idx.sum(axis=(1, 2))                           # (N,1) pixels in blob
    has_blob = support[:, 0] > 0                             # (N,)

    # blob-mean prob per (n, c); 0 where the sample lacks the blob
    # (consensus_loss.py:127-136, custom_div)
    psum = prob_blob.sum(axis=(1, 2))                        # (N,C)
    prob_blob_mean = jnp.where(support > 0, psum / jnp.maximum(support, 1.0),
                               0.0)

    # 1. label NLL of the blob mean (consensus_loss.py:138-144); the blob id
    # doubles as the class label since target == blobs for binary masks.
    p_target = prob_blob_mean[:, s]
    loss_avg = jnp.where(has_blob,
                         -jnp.log(jnp.maximum(p_target, 1e-30)), 0.0)
    loss_avg = loss_avg.mean()

    # 2. consensus deviation: KL(blob-mean || per-pixel) over in-blob pixels
    # (consensus_loss.py:149-164). Outside the blob prob_blob == 0 and both
    # log terms are forced to contribute zero, as in the reference's masking.
    in_blob = prob_blob > 0                                  # (N,H,W,C)
    t = prob_blob_mean[:, None, None, :]                     # broadcast mean
    log_x = jnp.where(in_blob, jnp.log(jnp.maximum(prob_blob, 1e-30)), 0.0)
    log_t = jnp.where(in_blob, jnp.log(jnp.maximum(t, 1e-30)), 0.0)
    kl = jnp.where(in_blob, t * (log_t - log_x), 0.0)
    denom = jnp.maximum(in_blob.sum(), 1)
    loss_dev = kl.sum() / denom

    return alpha * loss_avg + beta * loss_dev, has_blob.any()


def structure_consensus_loss(logit: jnp.ndarray, blobs: jnp.ndarray,
                             target: jnp.ndarray | None = None,
                             alpha: float = 10.0, beta: float = 5.0,
                             num_blob_ids: int = 2) -> jnp.ndarray:
    """`StructureConsensuLossFunction(10.0, 5.0, 'idx', 'idx')` parity.

    logit: (N, H, W, C) pre-softmax decoder output (C = 2).
    blobs: (N, H, W) int blob/label map; for MSML, the binary occlusion mask
           (blobs == target, `train.py:255-258`).
    """
    del target  # target == blobs for the binary-mask training path
    prob = softmax(logit.astype(jnp.float32), axis=-1)
    total = 0.0
    count = 0.0
    for s in range(num_blob_ids):
        loss_s, present = _blob_loss(prob, blobs == s, s, alpha, beta)
        w = present.astype(jnp.float32)
        total = total + w * loss_s
        count = count + w
    return total / jnp.maximum(count, 1.0)
