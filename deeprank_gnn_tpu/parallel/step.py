"""Sharded training step: one jitted XLA program over the mesh.

`make_sharded_train_step(model, optimizer, mesh, task)` returns a
compiled function `(params, opt_state, batch, rng) -> (params,
opt_state, loss, pred)` where the batch arrives with the canonical
GraphBatch shardings (`mesh.batch_shardings`) and params/optimizer
state are replicated. Forward, backward, cross-shard reductions and
the Adam update all live in a single XLA executable; collectives ride
ICI.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deeprank_gnn_tpu.train.losses import cross_entropy_loss, mse_loss


def make_sharded_train_step(
    model,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    task: str = "reg",
    class_weights: Optional[jax.Array] = None,
    transform_sigmoid: bool = False,
) -> Callable:
    replicated = NamedSharding(mesh, P())

    def loss_fn(params, batch, rng):
        pred = model.apply(params, batch, training=True, rng=rng)
        if task == "class":
            return cross_entropy_loss(
                pred, batch.y.astype(jnp.int32), batch.y_mask, class_weights
            ), pred
        p = pred.reshape(-1)
        if transform_sigmoid:
            p = jax.nn.sigmoid(p)
        return mse_loss(p, batch.y, batch.y_mask), p

    def step(params, opt_state, batch, rng):
        rng, key = jax.random.split(rng)  # key derivation stays on device
        (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, pred, rng

    # the batch position is `None`: the sharding is inherited from the
    # committed input arrays, which `shard_batch` places with the
    # canonical `batch_shardings`. Spelling the shardings out here
    # instead would pin the batch's static `edges_sorted` flag into the
    # in_shardings treedef and break on the other flag value.
    return jax.jit(
        step,
        in_shardings=(replicated, replicated, None, replicated),
        out_shardings=(
            replicated,
            replicated,
            replicated,
            replicated,
            replicated,
        ),
    )
