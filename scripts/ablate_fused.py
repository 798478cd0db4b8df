"""Ablation of fused_gin_conv implementations inside the scanned step
on the real chip. Arms select the impl via DRGNN_FUSED_IMPL (read at
trace time) and exact/fast via DRGNN_DENSE_FAST.
Run: python scripts/ablate_fused.py
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
from deeprank_gnn_tpu.train.scan import gather_store_batch


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
    params0 = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)

    results = {}

    def run_arm(name, impl, fast):
        env = {}
        if impl is not None:
            env["DRGNN_FUSED_IMPL"] = impl
        if fast:
            env["DRGNN_DENSE_FAST"] = "1"
        old = {k: os.environ.get(k) for k in
               ("DRGNN_FUSED_IMPL", "DRGNN_DENSE_FAST")}
        os.environ.pop("DRGNN_FUSED_IMPL", None)
        os.environ.pop("DRGNN_DENSE_FAST", None)
        os.environ.update(env)
        try:
            def loss_fn(p, batch, key):
                pred = model.apply(p, batch, training=True, rng=key)
                return mse_loss(pred.reshape(-1), batch.y, batch.y_mask)

            def body(carry, idx):
                p, o, r = carry
                r, key = jax.random.split(r)
                batch = gather_store_batch(store.store, y_all, idx)
                loss, g = jax.value_and_grad(loss_fn)(p, batch, key)
                u, o = opt.update(g, o, p)
                p = optax.apply_updates(p, u)
                return (p, o, r), loss

            @jax.jit
            def run(p, o, r):
                (p, o, r), losses = jax.lax.scan(body, (p, o, r), slots_dev)
                return p, o, r, losses

            p, o, r = params0, opt.init(params0), jax.random.PRNGKey(1)
            p, o, r, losses = run(p, o, r)
            _ = float(losses.sum())
            best = float("inf")
            for _w in range(3):
                t0 = time.perf_counter()
                for _ in range(8):
                    p, o, r, losses = run(p, o, r)
                _ = float(losses.sum())
                best = min(best, time.perf_counter() - t0)
            ms = best / (8 * B) * 1e3
            results[name] = ms
            print(f"{name}: {ms:.3f} ms/step", flush=True)
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    run_arm("gather_exact", None, False)
    run_arm("gather_fast", None, True)
    run_arm("twosided_exact", "twosided", False)
    run_arm("twosided_fast", "twosided", True)
    run_arm("pallas_exact", "pallas", False)
    run_arm("pallas_fast", "pallas", True)
    print(results)


if __name__ == "__main__":
    main()
