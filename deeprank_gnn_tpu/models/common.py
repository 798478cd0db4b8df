"""Shared model utilities: initializers and linear-layer helpers.

Initializer parity with the reference:

- PyG's ``uniform(size, tensor)`` (used for all conv parameters,
  reference `ginet.py:43-48`, `foutnet.py:50-54`, `sGAT.py:57-59`)
  draws U(-1/sqrt(size), 1/sqrt(size)).
- torch ``nn.Linear`` default (the fc heads) draws the weight from
  kaiming_uniform(a=sqrt(5)) which reduces to U(-1/sqrt(fan_in),
  1/sqrt(fan_in)), and the bias from the same bound.

Weights are stored in torch layout ``[out, in]`` (applied as x @ W.T) so
reference checkpoints map 1:1.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def uniform_init(
    rng: jax.Array, shape: Tuple[int, ...], size: int, dtype=jnp.float32
) -> jax.Array:
    """PyG `torch_geometric.nn.inits.uniform`: U(-1/sqrt(size), 1/sqrt(size))."""
    bound = 1.0 / (size ** 0.5)
    return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)


def linear_init(
    rng: jax.Array, in_features: int, out_features: int, dtype=jnp.float32
) -> Tuple[jax.Array, jax.Array]:
    """torch nn.Linear default init -> (weight [out, in], bias [out])."""
    wkey, bkey = jax.random.split(rng)
    bound = 1.0 / (in_features ** 0.5)
    w = jax.random.uniform(
        wkey, (out_features, in_features), dtype, minval=-bound, maxval=bound
    )
    b = jax.random.uniform(bkey, (out_features,), dtype, minval=-bound, maxval=bound)
    return w, b


def linear(x: jax.Array, w: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """x @ W.T (+ b) with torch-layout weight [out, in]."""
    y = x @ w.T
    if b is not None:
        y = y + b
    return y


def dropout(
    x: jax.Array, rate: float, rng: jax.Array | None, training: bool
) -> jax.Array:
    """Inverted dropout matching `F.dropout` (reference `ginet.py:138`)."""
    if not training or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
