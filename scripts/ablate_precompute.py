"""Precomputed-operator step vs one-hot step on the real chip, with
dispatch overhead isolated: every arm is ONE jitted call scanning K
steps (K=32), so per-call tunnel latency (~3.5 ms, see
scripts/ablate_overhead.py) is 1/K-amortized. Also scales the
whole-run train scan over nepoch to expose any per-epoch overhead.
Run: python scripts/ablate_precompute.py
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
from deeprank_gnn_tpu.train.scan import gather_store_batch, make_train_scan


def time_call(fn, *args, windows=5):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())  # drain
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].sum())
        best = min(best, time.perf_counter() - t0)
    return best * 1e3  # ms per call


def main():
    graphs = bench.build_graphs(num_graphs=4 * bench.BATCH_GRAPHS)
    with tempfile.TemporaryDirectory() as td:
        h5path = os.path.join(td, "bench.hdf5")
        feat_names = bench.write_bench_hdf5(graphs, h5path)
        ds = HDF5DataSet(
            database=h5path, node_feature=feat_names, edge_feature=["dist"],
            target="irmsd", clustering_method="mcl",
        )
        stores = {}
        for name, pre in [("onehot", False), ("ops", True)]:
            loader = GraphLoader(
                ds, batch_size=bench.BATCH_GRAPHS, shuffle=False,
                layout="dense", device_cache=True, precompute_ops=pre,
            )
            slots, _ = loader.device_epoch_plan()
            stores[name] = (loader._store, jnp.asarray(np.tile(slots, (8, 1))))

    model = GINet(bench.NODE_FEATS, 1, 1)
    opt = optax.flatten(optax.adam(1e-3))

    def loss_fn(p, batch, key):
        pred = model.apply(p, batch, training=True, rng=key).reshape(-1)
        return mse_loss(pred, batch.y, batch.y_mask)

    results = {}
    for name, (store, s32) in stores.items():
        y_all = jnp.asarray(store.y_host.astype(np.float32))
        params = model.init(jax.random.PRNGKey(0))
        opt_state = opt.init(params)
        rng = jax.random.PRNGKey(1)

        def body(carry, idx, _store=store, _y=y_all):
            p, o, r = carry
            r, key = jax.random.split(r)
            batch = gather_store_batch(_store.store, _y, idx)
            loss, g = jax.value_and_grad(loss_fn)(p, batch, key)
            u, o = opt.update(g, o, p)
            p = optax.apply_updates(p, u)
            return (p, o, r), loss

        @jax.jit
        def run32(p, o, r, _body=body, _s=s32):
            (p, o, r), losses = jax.lax.scan(_body, (p, o, r), _s)
            return losses

        ms = time_call(run32, params, opt_state, rng)
        results[f"step32_{name}"] = ms / 32
        print(f"step32_{name}: {ms / 32:.4f} ms/step ({ms:.2f} ms/call)",
              flush=True)

    # staged FORWARD-only scans (operator store): where does the ~1 ms
    # device step go?
    store, s32 = stores["ops"]
    y_all = jnp.asarray(store.y_host.astype(np.float32))
    from deeprank_gnn_tpu.ops import dense as dops
    from deeprank_gnn_tpu.models.common import dropout, linear

    def staged_fwd(upto):
        def fwd(p, batch, key):
            c0g = batch.pool0_mask.shape[1]
            c1g = batch.pool1_mask.shape[1]
            h = jax.nn.relu(
                jnp.concatenate(
                    [batch.agg_x @ p.conv1.fc_w.T,
                     batch.agg_x @ p.conv1_ext.fc_w.T], axis=-1)
            )
            if upto == "conv1":
                return h.sum()
            hp = dops.slot_max_pool(h, batch.assign0, c0g)
            if upto == "pool0":
                return hp.sum()
            hw = jnp.concatenate(
                [hp[..., :16] @ p.conv2.fc_w.T,
                 hp[..., 16:] @ p.conv2_ext.fc_w.T], axis=-1)
            h2 = jax.nn.relu(dops.adj_conv(hw, batch.adj1, True))
            if upto == "conv2":
                return h2.sum()
            hq = dops.slot_max_pool(h2, batch.assign1, c1g)
            if upto == "pool1":
                return hq.sum()
            hg = dops.masked_mean(hq, batch.pool1_mask)
            hg = jax.nn.relu(linear(hg, p.fc1_w, p.fc1_b))
            hg = dropout(hg, 0.4, key, True)
            pred = linear(hg, p.fc2_w, p.fc2_b).reshape(-1)
            return mse_loss(pred, batch.y, batch.y_mask)
        return fwd

    for upto in ("conv1", "pool0", "conv2", "pool1", "full"):
        fwd = staged_fwd(upto)

        def body_f(carry, idx, _fwd=fwd):
            p, r = carry
            r, key = jax.random.split(r)
            batch = gather_store_batch(store.store, y_all, idx)
            return (p, r), _fwd(p, batch, key)

        @jax.jit
        def run_f(p, r, _b=body_f):
            (p, r), losses = jax.lax.scan(_b, (p, r), s32)
            return losses

        params = model.init(jax.random.PRNGKey(0))
        ms = time_call(run_f, params, jax.random.PRNGKey(1), windows=3)
        results[f"fwd32_{upto}"] = ms / 32
        print(f"fwd32_{upto}: {ms / 32:.4f} ms/step", flush=True)

    # fwd+bwd (no optimizer) for the full stage
    def body_g(carry, idx):
        p, r = carry
        r, key = jax.random.split(r)
        batch = gather_store_batch(store.store, y_all, idx)
        loss, g = jax.value_and_grad(
            lambda q: staged_fwd("full")(q, batch, key)
        )(p)
        p = jax.tree.map(lambda a, b: a - 0.0 * b, p, g)
        return (p, r), loss

    @jax.jit
    def run_g(p, r):
        (p, r), losses = jax.lax.scan(body_g, (p, r), s32)
        return losses

    params = model.init(jax.random.PRNGKey(0))
    ms = time_call(run_g, params, jax.random.PRNGKey(1), windows=3)
    results["fwdbwd32_full"] = ms / 32
    print(f"fwdbwd32_full: {ms / 32:.4f} ms/step", flush=True)

    # whole-run scan scaling over nepoch (operator store)
    store, s32 = stores["ops"]
    y_all = jnp.asarray(store.y_host.astype(np.float32))
    slots1 = np.asarray(s32)[:4]  # one epoch's slot matrix
    for track_best in (False, True):
        for nepoch in (1, 2, 8):
            slots_te = jnp.asarray(np.stack([slots1] * nepoch))
            run = jax.jit(
                make_train_scan(
                    lambda p, b, k, t: (loss_fn(p, b, k), jnp.zeros(())),
                    opt, has_valid=False, track_best=track_best,
                )
            )
            params = model.init(jax.random.PRNGKey(0))
            opt_state = opt.init(params)
            rng = jax.random.PRNGKey(1)
            floor = jnp.asarray(np.inf, jnp.float32)
            ms = time_call(
                run, params, opt_state, rng, floor, store.store, y_all,
                slots_te, windows=3,
            )
            key = f"trainscan_e{nepoch}_best{int(track_best)}"
            results[key] = ms
            print(f"{key}: {ms:.2f} ms/call "
                  f"({ms / (nepoch * slots1.shape[0]):.4f} ms/step)",
                  flush=True)

    print(results)


if __name__ == "__main__":
    main()
