"""Compiled scanned epochs: one XLA execution per epoch.

The reference dispatches one forward/backward per batch from Python
(reference `NeuralNet.py:477-523`), so every step pays host dispatch
latency — on a remote TPU that dwarfs the ~0.2 ms of actual compute a
residue-graph batch needs. With the dataset resident in HBM
(`data/device_store.py`), nothing about an epoch requires the host at
all: batch assembly is a gather over the graph axis and the step is a
pure function. This module rolls the whole epoch into a single
``lax.scan`` over the epoch's slot matrix, so the host dispatches ONE
program per epoch and reads back one stacked (losses, predictions)
pair.

The scan body is the exact same math as the per-batch jitted step
(`NeuralNet._build_steps`): gather the batch from the store, forward,
backward, Adam update. Per-epoch results are bit-comparable to the
looped path because the PRNG threading (one `split` per batch) and the
batch order (the loader's seeded shuffle) are identical.

TPU-native rationale: ``lax.scan`` compiles the step ONCE as the loop
body (no unrolling, no per-iteration retrace) and XLA keeps params,
optimizer state, and the store in HBM across iterations; the only
host<->device traffic in a steady-state epoch is the final readback of
the stacked outputs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax


def gather_store_batch(store, y_all: jax.Array, idx: jax.Array):
    """Assemble one batch on-device: ``idx`` rows of every store field.

    ``y_all`` carries the (possibly class-remapped) targets aligned to
    store slots; the store's own ``y`` field holds raw file targets.
    """
    batch = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), store)
    return dataclasses.replace(batch, y=jnp.take(y_all, idx))


def make_epoch_steps(loss_and_pred, optimizer: optax.GradientTransformation):
    """Build (epoch_train, epoch_eval) scan functions.

    ``loss_and_pred(params, batch, rng_key, training) -> (loss, pred)``
    is the engine's loss closure (`NeuralNet._loss_and_pred`).

    epoch_train(params, opt_state, store, y_all, slots, rng)
        -> (params, opt_state, losses[B], preds[B, ...], rng)
    epoch_eval(params, store, y_all, slots) -> (losses[B], preds[B, ...])

    ``slots`` is the epoch's [num_batches, batch_size] int32 slot
    matrix (padding rows point at the store's all-padding slot, whose
    ``y_mask`` is False — masked out of every loss and metric).
    """

    def epoch_train(params, opt_state, store, y_all, slots, rng):
        def body(carry, idx):
            params, opt_state, rng = carry
            rng, key = jax.random.split(rng)
            batch = gather_store_batch(store, y_all, idx)
            (loss, pred), grads = jax.value_and_grad(
                lambda p: loss_and_pred(p, batch, key, True), has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), (loss, pred)

        (params, opt_state, rng), (losses, preds) = jax.lax.scan(
            body, (params, opt_state, rng), slots
        )
        return params, opt_state, losses, preds, rng

    def epoch_eval(params, store, y_all, slots):
        def body(carry, idx):
            batch = gather_store_batch(store, y_all, idx)
            loss, pred = loss_and_pred(params, batch, None, False)
            return carry, (loss, pred)

        _, (losses, preds) = jax.lax.scan(body, None, slots)
        return losses, preds

    return epoch_train, epoch_eval
