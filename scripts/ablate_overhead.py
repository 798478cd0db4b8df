"""Discriminate per-call dispatch overhead vs per-step device cost in
the scanned epoch: same bodies at 4 vs 32 scan steps per call, plus
empty/gather-only bodies. Run: python scripts/ablate_overhead.py
"""

import os
import sys
import tempfile
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
from deeprank_gnn_tpu.train.scan import gather_store_batch, make_epoch_steps


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
    s4 = jnp.asarray(slots)                      # 4 steps
    s32 = jnp.asarray(np.tile(slots, (8, 1)))    # 32 steps

    model = GINet(bench.NODE_FEATS, 1, 1)
    params = model.init(jax.random.PRNGKey(0))
    results = {}

    def run_arm(name, body, slots_dev, carry):
        B = slots_dev.shape[0]

        @jax.jit
        def run(*c):
            c2, losses = jax.lax.scan(body, c, slots_dev)
            return (*c2, losses)

        out = run(*carry)
        _ = float(out[-1].sum())
        best = float("inf")
        for _w in range(3):
            t0 = time.perf_counter()
            c = carry
            for _ in range(8):
                out = run(*c)
                c = out[: len(carry)]
            _ = float(out[-1].sum())
            best = min(best, time.perf_counter() - t0)
        ms = best / (8 * B) * 1e3
        results[name] = ms
        print(f"{name}: {ms:.3f} ms/step", flush=True)

    def body_empty(carry, idx):
        (p,) = carry
        return (p,), idx.sum().astype(jnp.float32)

    def body_gather_x(carry, idx):
        (p,) = carry
        # x lives in the packed store's 'x' segment (rows also hold
        # node_mask; close enough for a gather-cost arm)
        x = jnp.take(store.store.segments["x"], idx, axis=0)
        return (p,), x.sum().astype(jnp.float32)

    def body_gather_all(carry, idx):
        (p,) = carry
        batch = gather_store_batch(store.store, y_all, idx)
        tot = sum(
            jnp.sum(getattr(batch, f).astype(jnp.float32))
            for f in ("x", "edge_attr", "y")
        ) + sum(
            jnp.sum(getattr(batch, f).astype(jnp.float32))
            for f in ("row", "col", "assign0", "assign1")
        )
        return (p,), tot

    def body_xw(carry, idx):
        (p,) = carry
        x = gather_store_batch(store.store, y_all, idx).x
        xw = jnp.concatenate(
            [x @ p.conv1.fc_w.T, x @ p.conv1_ext.fc_w.T], axis=-1
        )
        return (p,), xw.sum()

    run_arm("empty_4", body_empty, s4, (params,))
    run_arm("empty_32", body_empty, s32, (params,))
    run_arm("gatherx_4", body_gather_x, s4, (params,))
    run_arm("gatherall_4", body_gather_all, s4, (params,))
    run_arm("xw_4", body_xw, s4, (params,))
    run_arm("xw_32", body_xw, s32, (params,))

    # full train step at 4 vs 32 steps/call
    def loss_and_pred(p, batch, key, training):
        pred = model.apply(p, batch, training=training, rng=key)
        pred = pred.reshape(-1)
        return mse_loss(pred, batch.y, batch.y_mask), pred

    opt = optax.flatten(optax.adam(1e-3))
    epoch_train, _ = make_epoch_steps(loss_and_pred, opt)

    def full_arm(name, slots_dev):
        B = slots_dev.shape[0]
        jt = jax.jit(epoch_train, donate_argnums=(0, 1))
        p, o, r = params, opt.init(params), jax.random.PRNGKey(1)
        p, o, losses, _pr, r = jt(p, o, store.store, y_all, slots_dev, r)
        _ = float(losses.sum())
        best = float("inf")
        for _w in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                p, o, losses, _pr, r = jt(
                    p, o, store.store, y_all, slots_dev, r
                )
            _ = float(losses.sum())
            best = min(best, time.perf_counter() - t0)
        ms = best / (8 * B) * 1e3
        results[name] = ms
        print(f"{name}: {ms:.3f} ms/step", flush=True)

    full_arm("full_4", s4)
    try:
        full_arm("full_32", s32)
    except Exception as exc:
        print("full_32 failed:", type(exc).__name__, str(exc)[:200])

    print(results)


if __name__ == "__main__":
    main()
