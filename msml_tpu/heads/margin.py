"""Margin-softmax classification heads.

Parity targets (reference `headers/margin_losses.py`):
  * Softmax   — plain FC layer (`margin_losses.py:18-68`)
  * AMCosFace — logit  cos(theta) - (m - k*(theta_y - a)) at the target class
                (`margin_losses.py:203-305`)
  * AMArcFace — logit  cos(theta + m - k*(theta_y - a)) at the target class
                (`margin_losses.py:318-418`)

All three honour the ``label == -1`` invalid-class convention used by PartialFC
(`margin_losses.py:275-299,390-417`): rows whose label is -1 receive no margin.

TPU-first design: the margin transforms are *pure functions* on a precomputed
cosine matrix, fully vectorised (one-hot select instead of the reference's
in-place scatter), so they fuse into the normalise->matmul->margin->scale chain
under jit and can be applied to class-sharded local logits inside PartialFC.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch.nn.functional.normalize parity: x / max(||x||, eps).

    The clamp sits INSIDE the sqrt: values are identical (sqrt is
    monotone), but `x / maximum(linalg.norm(x), eps)` has a NaN gradient
    at x = 0 in JAX — d(sqrt)/du is inf at 0 and the chain rule's 0 * inf
    poisons the whole backward pass (per-device batch 1 makes the feature
    BN emit exactly the zero vector, which fed this). torch's norm defines
    a zero subgradient at 0, so the reference trains through it; clamping
    under the sqrt reproduces that (the maximum routes zero gradient to
    the sum-of-squares branch)."""
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, eps * eps))


def cosine_logits(embedding: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """cos(theta) = normalize(emb) @ normalize(W)^T.

    weight layout is (num_classes, dim) like the reference Parameter
    (`margin_losses.py:238,353`).
    """
    e = l2_normalize(embedding.astype(jnp.float32))
    w = l2_normalize(weight.astype(jnp.float32))
    return jnp.dot(e, w.T, preferred_element_type=jnp.float32)


def _target_margin(cosine: jnp.ndarray, label: jnp.ndarray,
                   m: float, a: float, k: float):
    """Per-row adaptive margin  m - k*(theta_y - a)  and its one-hot mask.

    Rows with label == -1 get a zero mask (no margin applied).
    """
    num_classes = cosine.shape[1]
    valid = label >= 0
    safe_label = jnp.where(valid, label, 0)
    cos_y = jnp.take_along_axis(cosine, safe_label[:, None], axis=1)[:, 0]
    theta_y = jnp.arccos(jnp.clip(cos_y, -1.0, 1.0))
    margin = m - k * (theta_y - a)  # scalar margin per valid row
    one_hot = nn.one_hot(safe_label, num_classes, dtype=cosine.dtype)
    one_hot = one_hot * valid[:, None].astype(cosine.dtype)
    return margin, one_hot


def amcos_margin(cosine: jnp.ndarray, label: jnp.ndarray,
                 s: float = 64.0, m: float = 0.4,
                 a: float = 1.2, k: float = 0.1) -> jnp.ndarray:
    """AMCosFace: s * (cos(theta) - (m - k*(theta_y - a))) at the target entry
    (reference `margin_losses.py:286-303`)."""
    margin, one_hot = _target_margin(cosine, label, m, a, k)
    return (cosine - one_hot * margin[:, None]) * s


def amarc_margin(cosine: jnp.ndarray, label: jnp.ndarray,
                 s: float = 64.0, m: float = 0.5,
                 a: float = 1.2, k: float = 0.1) -> jnp.ndarray:
    """AMArcFace: s * cos(theta + (m - k*(theta_y - a))) at the target entry
    (reference `margin_losses.py:401-418`).

    Matches the reference's arccos->add->cos roundtrip on every entry (the
    off-target additive term is 0, so cos(arccos(x)) == x up to fp eps,
    exactly as in the in-place torch version).
    """
    margin, one_hot = _target_margin(cosine, label, m, a, k)
    theta = jnp.arccos(jnp.clip(cosine, -1.0, 1.0))
    return jnp.cos(theta + one_hot * margin[:, None]) * s


def softmax_margin(logits: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """Identity margin (plain softmax head)."""
    del label
    return logits


def get_margin_fn(header_type: str, header_params) -> Callable:
    """Resolve a (logits, label) -> logits margin transform by config name
    (reference `backbones/msml.py:124-148`)."""
    s, m, a, k = header_params
    if "Softmax" in header_type:
        return softmax_margin
    if "AMCosFace" in header_type:
        return lambda cosine, label: amcos_margin(cosine, label, s, m, a, k)
    if "AMArcFace" in header_type:
        return lambda cosine, label: amarc_margin(cosine, label, s, m, a, k)
    raise ValueError(f"Header type error: {header_type}")


class SoftmaxHead(nn.Module):
    """Plain FC classification head (reference `margin_losses.py:18-68`)."""

    num_classes: int

    @nn.compact
    def __call__(self, embedding: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
        del label
        dim_in = embedding.shape[-1]
        weight = self.param("weight", nn.initializers.xavier_uniform(),
                            (self.num_classes, dim_in), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.num_classes,),
                          jnp.float32)
        return jnp.dot(embedding.astype(jnp.float32), weight.T,
                       preferred_element_type=jnp.float32) + bias


class MarginHead(nn.Module):
    """AMCosFace / AMArcFace full-class head (reference
    `margin_losses.py:203-428`): normalise -> matmul -> margin -> scale."""

    num_classes: int
    header_type: str = "AMArcFace"
    s: float = 64.0
    m: float = 0.5
    a: float = 0.0
    k: float = 0.0

    @nn.compact
    def __call__(self, embedding: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
        dim_in = embedding.shape[-1]
        weight = self.param("weight", nn.initializers.xavier_uniform(),
                            (self.num_classes, dim_in), jnp.float32)
        cosine = cosine_logits(embedding, weight)
        if "AMCosFace" in self.header_type:
            return amcos_margin(cosine, label, self.s, self.m, self.a, self.k)
        if "AMArcFace" in self.header_type:
            return amarc_margin(cosine, label, self.s, self.m, self.a, self.k)
        raise ValueError(f"Header type error: {self.header_type}")
