"""Stage-by-stage ablation of the dense fused GINet FORWARD inside a
scanned epoch on the real chip (the forward is ~80% of the step; see
scripts/ablate_step.py). Run: python scripts/ablate_fwd.py
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

from deeprank_gnn_tpu.data.batch import GraphLoader
from deeprank_gnn_tpu.data.dataset import HDF5DataSet
from deeprank_gnn_tpu.models import GINet
from deeprank_gnn_tpu.ops import dense as dops
from deeprank_gnn_tpu.ops.pallas import fused_gin_conv
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
    params = model.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    results = {}

    def run_arm(name, fwd):
        def body(carry, idx):
            p, r = carry
            r, key = jax.random.split(r)
            batch = gather_store_batch(store.store, y_all, idx)
            return (p, r), fwd(p, batch, key)

        @jax.jit
        def run(p, r):
            (_, r), losses = jax.lax.scan(body, (p, r), slots_dev)
            return r, losses

        r = rng
        r, losses = run(params, r)
        _ = float(losses.sum())
        best = float("inf")
        for _w in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                r, losses = run(params, r)
            _ = float(losses.sum())
            best = min(best, time.perf_counter() - t0)
        ms = best / (8 * B) * 1e3
        results[name] = ms
        print(f"{name}: {ms:.3f} ms/step", flush=True)

    def stage(upto):
        def fwd(p, batch, key):
            c0g = batch.pool0_mask.shape[1]
            c1g = batch.pool1_mask.shape[1]
            xw = jnp.concatenate(
                [batch.x @ p.conv1.fc_w.T, batch.x @ p.conv1_ext.fc_w.T],
                axis=-1,
            )
            if upto == "xw":
                return xw.sum()
            h = jax.nn.relu(fused_gin_conv(xw, batch.row, batch.col, True))
            if upto == "conv1":
                return h.sum()
            hp = dops.slot_max_pool(h, batch.assign0, c0g)
            if upto == "pool0":
                return hp.sum()
            hw = jnp.concatenate(
                [hp[..., :16] @ p.conv2.fc_w.T, hp[..., 16:] @ p.conv2_ext.fc_w.T],
                axis=-1,
            )
            h2 = jax.nn.relu(fused_gin_conv(hw, batch.pe_row, batch.pe_col, True))
            if upto == "conv2":
                return h2.sum()
            hq = dops.slot_max_pool(h2, batch.assign1, c1g)
            if upto == "pool1":
                return hq.sum()
            hg = dops.masked_mean(hq, batch.pool1_mask)
            from deeprank_gnn_tpu.models.common import dropout, linear

            hg = jax.nn.relu(linear(hg, p.fc1_w, p.fc1_b))
            hg = dropout(hg, 0.4, key, True)
            pred = linear(hg, p.fc2_w, p.fc2_b).reshape(-1)
            return mse_loss(pred, batch.y, batch.y_mask)

        return fwd

    run_arm("s0_xw", stage("xw"))
    run_arm("s1_conv1", stage("conv1"))
    run_arm("s2_pool0", stage("pool0"))
    run_arm("s3_conv2", stage("conv2"))
    run_arm("s4_pool1", stage("pool1"))
    run_arm("s5_full", stage("full"))

    # pool via flattened segment_max instead of broadcast
    orig = dops._BCAST_POOL_BYTES
    dops._BCAST_POOL_BYTES = 0
    try:
        run_arm("s2_pool0_segmax", stage("pool0"))
    finally:
        dops._BCAST_POOL_BYTES = orig

    print(results)


if __name__ == "__main__":
    main()
