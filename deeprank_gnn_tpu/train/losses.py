"""Masked losses matching the reference's torch loss selection
(reference `NeuralNet.py:239-263`): MSELoss for regression and
(optionally class-weighted) CrossEntropyLoss for classification.

Padding-aware: every batch is padded to a static graph count, so the
losses take a validity mask and reduce only over real graphs. For a
full batch this is bit-identical to the torch 'mean' reductions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def mse_loss(pred: jax.Array, y: jax.Array, mask: jax.Array) -> jax.Array:
    """torch MSELoss(reduction='mean') over real graphs."""
    sq = (pred - y) ** 2
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(jnp.where(mask, sq, 0.0)) / denom


def cross_entropy_loss(
    logits: jax.Array,
    y_idx: jax.Array,
    mask: jax.Array,
    weights: Optional[jax.Array] = None,
) -> jax.Array:
    """torch CrossEntropyLoss(weight=w, reduction='mean'):
    sum_i w[y_i] * nll_i / sum_i w[y_i] (reference `NeuralNet.py:262`)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    y_safe = jnp.clip(y_idx, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, y_safe[:, None], axis=-1)[:, 0]
    if weights is None:
        w = jnp.ones_like(nll)
    else:
        w = jnp.take(weights, y_safe)
    w = jnp.where(mask, w, 0.0)
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-12)
