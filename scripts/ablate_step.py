"""Ablation of the scanned train step on the real chip: where does the
~1.1 ms/step go? Each arm scans the same epoch slot matrix; timing is
drained by a host readback. Run: python scripts/ablate_step.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench

bench._enable_compile_cache()

import jax
import jax.numpy as jnp
import optax

from deeprank_gnn_tpu.data.batch import GraphLoader
from deeprank_gnn_tpu.data.dataset import HDF5DataSet
from deeprank_gnn_tpu.models import GINet
from deeprank_gnn_tpu.train.losses import mse_loss
from deeprank_gnn_tpu.train.scan import gather_store_batch

import tempfile


def time_scan(fn, carry, steps_per_call, n_calls=8, windows=3):
    out = fn(*carry)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        c = carry
        for _ in range(n_calls):
            out = fn(*c)
            c = (out[0], out[1], *carry[2:]) if len(carry) > 2 else carry
        _ = float(jax.tree_util.tree_leaves(out)[0].sum())
        best = min(best, time.perf_counter() - t0)
    return best / (n_calls * steps_per_call) * 1e3  # ms/step


def main():
    graphs = bench.build_graphs(num_graphs=4 * bench.BATCH_GRAPHS)
    with tempfile.TemporaryDirectory() as td:
        h5path = os.path.join(td, "bench.hdf5")
        feat_names = bench.write_bench_hdf5(graphs, h5path)
        ds = HDF5DataSet(
            database=h5path, node_feature=feat_names, edge_feature=["dist"],
            target="irmsd", clustering_method="mcl",
        )
        loader = GraphLoader(
            ds, batch_size=bench.BATCH_GRAPHS, shuffle=False, layout="dense",
            device_cache=True,
        )
        slots, _ = loader.device_epoch_plan()
    store = loader._store
    y_all = jnp.asarray(store.y_host.astype(np.float32))
    slots_dev = jnp.asarray(slots)
    B = slots.shape[0]

    model = GINet(bench.NODE_FEATS, 1, 1)
    params = model.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)

    def loss_fn(p, batch, key):
        pred = model.apply(p, batch, training=True, rng=key).reshape(-1)
        return mse_loss(pred, batch.y, batch.y_mask)

    results = {}

    def scan_arm(name, body, init_carry):
        @jax.jit
        def run(*carry):
            c, outs = jax.lax.scan(body, carry, slots_dev)
            return c if isinstance(c, tuple) else (c,)

        # jit closure over store/y_all; carry donated implicitly no
        results[name] = time_scan(run, init_carry, B)
        print(name, round(results[name], 3), "ms/step", flush=True)

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    optf = optax.flatten(optax.adam(1e-3))
    optf_state = optf.init(params)

    # 1. forward only
    def body_fwd(carry, idx):
        (p, r) = carry
        r, key = jax.random.split(r)
        batch = gather_store_batch(store.store, y_all, idx)
        loss = loss_fn(p, batch, key)
        return (p, r), loss

    # 2. fwd+bwd
    def body_grad(carry, idx):
        (p, r) = carry
        r, key = jax.random.split(r)
        batch = gather_store_batch(store.store, y_all, idx)
        loss, g = jax.value_and_grad(loss_fn)(p, batch, key)
        p = jax.tree.map(lambda a, b: a - 0.0 * b, p, g)  # consume grads
        return (p, r), loss

    # 3. full adam
    def body_adam(carry, idx):
        (p, o, r) = carry
        r, key = jax.random.split(r)
        batch = gather_store_batch(store.store, y_all, idx)
        loss, g = jax.value_and_grad(loss_fn)(p, batch, key)
        u, o = opt.update(g, o, p)
        p = optax.apply_updates(p, u)
        return (p, o, r), loss

    # 4. full flattened adam
    def body_adamf(carry, idx):
        (p, o, r) = carry
        r, key = jax.random.split(r)
        batch = gather_store_batch(store.store, y_all, idx)
        loss, g = jax.value_and_grad(loss_fn)(p, batch, key)
        u, o = optf.update(g, o, p)
        p = optax.apply_updates(p, u)
        return (p, o, r), loss

    # 5. fwd only, no gather (same resident batch each step)
    fixed = gather_store_batch(store.store, y_all, slots_dev[0])

    def body_nogather(carry, idx):
        (p, r) = carry
        r, key = jax.random.split(r)
        loss = loss_fn(p, fixed, key)
        return (p, r), loss

    # 6. full adam, no dropout rng (training=False forward)
    def loss_eval(p, batch):
        pred = model.apply(p, batch, training=False).reshape(-1)
        return mse_loss(pred, batch.y, batch.y_mask)

    def body_nodrop(carry, idx):
        (p, o) = carry
        batch = gather_store_batch(store.store, y_all, idx)
        loss, g = jax.value_and_grad(loss_eval)(p, batch)
        u, o = opt.update(g, o, p)
        p = optax.apply_updates(p, u)
        return (p, o), loss

    scan_arm("fwd_only", body_fwd, (params, rng))
    scan_arm("fwd_nogather", body_nogather, (params, rng))
    scan_arm("fwd_bwd", body_grad, (params, rng))
    scan_arm("full_adam", body_adam, (params, opt_state, rng))
    scan_arm("full_adam_flat", body_adamf, (params, optf_state, rng))
    scan_arm("full_adam_nodropout", body_nodrop, (params, opt_state))

    print(results)


if __name__ == "__main__":
    main()
