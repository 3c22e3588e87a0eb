"""Mask-aware elementwise/reduction primitives shared by the models.

The reference expresses these implicitly with `-inf` fills and
multiplies scattered through each model file; here they are one audited
set of primitives so every model treats padding identically.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e9


def masked_softmax(
    logits: jnp.ndarray, mask: jnp.ndarray, axis: int = -1
) -> jnp.ndarray:
    """Softmax over ``axis`` with masked entries forced to probability 0.

    If an entire slice is masked out the result is all zeros (not NaN).
    mask is broadcastable to logits, 1=keep.
    """
    masked_logits = jnp.where(mask > 0, logits, NEG_INF)
    m = jnp.max(masked_logits, axis=axis, keepdims=True)
    unnorm = jnp.exp(masked_logits - m) * (mask > 0)
    denom = jnp.sum(unnorm, axis=axis, keepdims=True)
    return unnorm / jnp.maximum(denom, 1e-12)


def masked_mean(
    x: jnp.ndarray, mask: jnp.ndarray, axis: int = 1, eps: float = 1e-12
) -> jnp.ndarray:
    """Mean of ``x`` over ``axis`` counting only masked-in entries."""
    num = jnp.sum(x * mask, axis=axis)
    den = jnp.sum(mask, axis=axis)
    return num / jnp.maximum(den, eps)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along ``axis`` with zero-vector guard."""
    norm = jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=axis, keepdims=True), eps))
    return x / norm
