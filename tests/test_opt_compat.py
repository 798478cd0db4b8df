"""Optimizer-state compatibility (`train/checkpoint.py`).

The engine's Adam runs flattened (`optax.flatten`: one fused update
over the raveled parameter vector). Checkpoints written before that
switch carry per-leaf moment pytrees; `adapt_opt_state` must ravel
them onto the live optimizer's structure so old checkpoints keep
resuming with their moments intact.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from deeprank_gnn_tpu.train import checkpoint as ckpt


def _params():
    return {"w": jnp.arange(6.0).reshape(3, 2), "b": jnp.ones(4)}


def test_adapt_legacy_per_leaf_adam_state():
    params = _params()
    flat_opt = optax.flatten(optax.adam(1e-3))
    reference = flat_opt.init(params)
    # legacy layout: per-leaf moments (what optax.adam(params) yields)
    legacy = optax.adam(1e-3).init(params)
    legacy = (
        legacy[0]._replace(
            count=jnp.int32(11),
            mu=jax.tree.map(lambda a: a + 2.0, legacy[0].mu),
        ),
    ) + tuple(legacy[1:])
    adapted = ckpt.adapt_opt_state(legacy, reference)
    assert adapted is not None
    assert int(adapted[0].count) == 11
    assert adapted[0].mu.shape == reference[0].mu.shape
    # raveled in leaf order, values preserved
    from jax.flatten_util import ravel_pytree

    np.testing.assert_allclose(
        np.asarray(adapted[0].mu),
        np.asarray(ravel_pytree(jax.tree.map(lambda a: a + 2.0,
                                             optax.adam(1e-3).init(_params())[0].mu))[0]),
    )
    # the adapted state must actually drive the flat optimizer
    g = jax.tree.map(jnp.ones_like, params)
    _, new_state = flat_opt.update(g, adapted, params)
    assert int(new_state[0].count) == 12


def test_adapt_matching_state_passthrough():
    params = _params()
    flat_opt = optax.flatten(optax.adam(1e-3))
    st = flat_opt.init(params)
    adapted = ckpt.adapt_opt_state(
        jax.tree.map(np.asarray, st), st
    )
    assert adapted is not None
    np.testing.assert_allclose(
        np.asarray(adapted[0].nu), np.asarray(st[0].nu)
    )


def test_adapt_rejects_garbage():
    params = _params()
    st = optax.flatten(optax.adam(1e-3)).init(params)
    assert ckpt.adapt_opt_state({"nope": 1}, st) is None
