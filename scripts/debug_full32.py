"""Isolate the full_32 TPU InvalidArgument: full train step scanned 32
steps/call. Variants: donation on/off, preds output on/off, 8/16/32
steps. Run: python scripts/debug_full32.py
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

    model = GINet(bench.NODE_FEATS, 1, 1)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.flatten(optax.adam(1e-3))

    def loss_fn(p, batch, key):
        pred = model.apply(p, batch, training=True, rng=key)
        return mse_loss(pred.reshape(-1), batch.y, batch.y_mask), pred.reshape(-1)

    def make_body(with_preds):
        def body(carry, idx):
            p, o, r = carry
            r, key = jax.random.split(r)
            batch = gather_store_batch(store.store, y_all, idx)
            (loss, pred), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, batch, key
            )
            u, o = opt.update(g, o, p)
            p = optax.apply_updates(p, u)
            out = (loss, pred) if with_preds else loss
            return (p, o, r), out

        return body

    def try_arm(name, n_steps, donate, with_preds):
        sl = jnp.asarray(np.tile(slots, (max(1, n_steps // 4), 1))[:n_steps])
        body = make_body(with_preds)

        def fn(p, o, r):
            (p, o, r), outs = jax.lax.scan(body, (p, o, r), sl)
            losses = outs[0] if with_preds else outs
            return p, o, r, losses

        jt = jax.jit(fn, donate_argnums=(0, 1) if donate else ())
        try:
            p, o, r = params, opt.init(params), jax.random.PRNGKey(1)
            p, o, r, losses = jt(p, o, r)
            v = float(losses.sum())
            # steady-state timing
            best = float("inf")
            for _w in range(2):
                t0 = time.perf_counter()
                for _ in range(8):
                    p, o, r, losses = jt(p, o, r)
                _ = float(losses.sum())
                best = min(best, time.perf_counter() - t0)
            ms = best / (8 * n_steps) * 1e3
            print(f"{name}: OK loss={v:.3f} {ms:.3f} ms/step", flush=True)
        except Exception as exc:
            print(f"{name}: FAIL {type(exc).__name__} {str(exc)[:150]}",
                  flush=True)

    try_arm("s8_donate_preds", 8, True, True)
    try_arm("s16_donate_preds", 16, True, True)
    try_arm("s32_donate_preds", 32, True, True)
    try_arm("s32_nodonate_preds", 32, False, True)
    try_arm("s32_donate_nopreds", 32, True, False)
    try_arm("s128_donate_nopreds", 128, True, False)


if __name__ == "__main__":
    main()
