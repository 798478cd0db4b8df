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
    """Assemble one batch on-device: ``idx`` rows of the store.

    A :class:`data.device_store.PackedStore` costs one row gather per
    used SEGMENT (opcore/x/edges — unused segments are DCE'd, so an
    operator-path GINet step moves less than half the batch bytes); a
    plain DenseGraphBatch pytree (legacy/ablation form) gathers per
    field.

    ``y_all`` carries the (possibly class-remapped) targets aligned to
    store slots; the store's own ``y`` field holds raw file targets.
    """
    from deeprank_gnn_tpu.data.device_store import PackedStore, gather_packed

    if isinstance(store, PackedStore):
        batch = gather_packed(store, idx)
    else:
        batch = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), store)
    return dataclasses.replace(batch, y=jnp.take(y_all, idx))


def make_epoch_steps(
    loss_and_pred,
    optimizer: optax.GradientTransformation,
    *,
    unroll: int = 1,
    constrain_batch=None,
):
    """Build (epoch_train, epoch_eval) scan functions.

    ``unroll`` replicates the scan body in the compiled loop: on
    backends where loop iterations are dispatched host-side (the
    development tunnel), per-iteration dispatch dominates this
    latency-bound workload and unrolling divides it away; on directly
    attached chips it trades compile time for scheduler headroom.

    ``constrain_batch``: optional callable applied to each gathered
    batch inside the scan body — mesh runs pass a
    `with_sharding_constraint` to graph-axis sharding, so the store
    gather slices locally on every device and the step's gradient
    all-reduce is the only collective (scanned multi-chip epochs).

    ``loss_and_pred(params, batch, rng_key, training) -> (loss, pred)``
    is the engine's loss closure (`NeuralNet._loss_and_pred`).

    epoch_train(params, opt_state, store, y_all, slots, rng)
        -> (params, opt_state, losses[B], preds[B, ...], rng)
    epoch_eval(params, store, y_all, slots) -> (losses[B], preds[B, ...])

    ``slots`` is the epoch's [num_batches, batch_size] int32 slot
    matrix (padding rows point at the store's all-padding slot, whose
    ``y_mask`` is False — masked out of every loss and metric).
    """

    def _gather(store, y_all, idx):
        batch = gather_store_batch(store, y_all, idx)
        return constrain_batch(batch) if constrain_batch else batch

    def epoch_train(params, opt_state, store, y_all, slots, rng):
        def body(carry, idx):
            params, opt_state, rng = carry
            rng, key = jax.random.split(rng)
            batch = _gather(store, y_all, idx)
            (loss, pred), grads = jax.value_and_grad(
                lambda p: loss_and_pred(p, batch, key, True), has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), (loss, pred)

        (params, opt_state, rng), (losses, preds) = jax.lax.scan(
            body, (params, opt_state, rng), slots, unroll=unroll
        )
        return params, opt_state, losses, preds, rng

    def epoch_eval(params, store, y_all, slots):
        def body(carry, idx):
            batch = _gather(store, y_all, idx)
            loss, pred = loss_and_pred(params, batch, None, False)
            return carry, (loss, pred)

        _, (losses, preds) = jax.lax.scan(body, None, slots, unroll=unroll)
        return losses, preds

    return epoch_train, epoch_eval


def make_train_scan(
    loss_and_pred,
    optimizer: optax.GradientTransformation,
    *,
    has_valid: bool,
    track_best: bool,
    unroll: int = 1,
    constrain_batch=None,
):
    """Whole-training-run scan: EVERY epoch of `NeuralNet.train` in ONE
    XLA execution. ``unroll`` as in :func:`make_epoch_steps` (applies
    to the inner batch scans; the epoch-level scan stays rolled).

    An outer ``lax.scan`` over epochs wraps the per-epoch batch scan of
    :func:`make_epoch_steps`; with ``has_valid`` each epoch is followed
    by an on-device validation pass, and with ``track_best`` the
    best-so-far parameters are kept as scan carry (``lax.select`` per
    leaf on the reference's ``min(valid_loss) == current`` rule,
    reference `NeuralNet.py:326-343`) — so checkpoint SELECTION also
    happens on-device and the host dispatches one program for the whole
    run, reading back stacked per-epoch (losses, predictions) plus the
    winning parameters.

    run(params, opt_state, rng, best_floor, store_t, y_t, slots_te[,
    store_v, y_v, slots_ve]) ->
        (params, opt_state, rng, best, outs)
        best = (best_params, best_loss, best_epoch) or ()
        outs = (train_losses [E,B], train_preds [E,B,...]
                [, valid_losses [E,Bv], valid_preds [E,Bv,...]])

    ``best_floor`` seeds the best-loss carry (+inf on a fresh run; the
    min of the previous runs' losses when ``train()`` is called again,
    so selection matches the looped path's ``min`` over the full
    history). ``best_epoch`` stays -1 when no epoch beats the floor.

    ``constrain_batch``: as in :func:`make_epoch_steps` — mesh runs
    constrain each gathered batch to graph-axis sharding so the whole
    multi-epoch run executes across chips with the gradient all-reduce
    as the only collective (scanned multi-chip WHOLE-RUN training).

    PRNG threading and batch order are identical to the per-epoch scan
    and the per-batch loop, so results are bit-comparable across all
    three paths (`tests/test_train_scan.py`).
    """

    def _gather(store, y_all, idx):
        batch = gather_store_batch(store, y_all, idx)
        return constrain_batch(batch) if constrain_batch else batch

    def run(params, opt_state, rng, best_floor, store_t, y_t, slots_te,
            store_v=None, y_v=None, slots_ve=None):
        def batch_body(carry, idx):
            params, opt_state, rng = carry
            rng, key = jax.random.split(rng)
            batch = _gather(store_t, y_t, idx)
            (loss, pred), grads = jax.value_and_grad(
                lambda p: loss_and_pred(p, batch, key, True), has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), (loss, pred)

        def epoch(carry, xs):
            params, opt_state, rng, best = carry
            if has_valid:
                slots_e, vslots_e, eidx = xs
            else:
                slots_e, eidx = xs
            (params, opt_state, rng), (tl, tp) = jax.lax.scan(
                batch_body, (params, opt_state, rng), slots_e, unroll=unroll
            )
            if has_valid:
                def eval_body(c, idx):
                    batch = _gather(store_v, y_v, idx)
                    return c, loss_and_pred(params, batch, None, False)

                _, (vl, vp) = jax.lax.scan(
                    eval_body, None, vslots_e, unroll=unroll
                )
                outs = (tl, tp, vl, vp)
                sel = vl.sum()
            else:
                outs = (tl, tp)
                sel = tl.sum()
            if track_best:
                best_params, best_loss, best_epoch = best
                improved = sel <= best_loss
                best_params = jax.tree.map(
                    lambda b, p: jnp.where(improved, p, b), best_params, params
                )
                best_loss = jnp.where(improved, sel, best_loss)
                best_epoch = jnp.where(improved, eidx, best_epoch)
                best = (best_params, best_loss, best_epoch)
            return (params, opt_state, rng, best), outs

        nepoch = slots_te.shape[0]
        eidx = jnp.arange(nepoch, dtype=jnp.int32)
        xs = (slots_te, slots_ve, eidx) if has_valid else (slots_te, eidx)
        best0 = ()
        if track_best:
            best0 = (
                params,
                jnp.asarray(best_floor, jnp.float32),
                jnp.asarray(-1, jnp.int32),
            )
        (params, opt_state, rng, best), outs = jax.lax.scan(
            epoch, (params, opt_state, rng, best0), xs
        )
        return params, opt_state, rng, best, outs

    return run
