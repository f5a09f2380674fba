"""Classification losses (reference `train.py:230,262`)."""

from __future__ import annotations

import jax.numpy as jnp
from jax.nn import log_softmax, one_hot


def cross_entropy(logits: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.CrossEntropyLoss parity: mean over batch of -log p_y."""
    logp = log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, label[:, None], axis=1)[:, 0]
    return nll.mean()


def smoothed_one_hot_ce(logits: jnp.ndarray, label: jnp.ndarray,
                        epsilon: float = 0.1) -> jnp.ndarray:
    """CE against a label-smoothed target (used by single-device PartialFC
    parity tests; the sharded smoothing quirk lives in heads/partial_fc.py)."""
    n_cls = logits.shape[-1]
    logp = log_softmax(logits.astype(jnp.float32), axis=-1)
    t = (1 - epsilon) * one_hot(label, n_cls) + epsilon / (n_cls - 1) * (
        1 - one_hot(label, n_cls))
    return -(t * logp).sum(-1).mean()
