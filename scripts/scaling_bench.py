"""Directional scaling curve on a virtual CPU mesh.

Multi-chip TPU hardware is not reachable from this environment, so the
scaling *shape* is measured on XLA:CPU with
``--xla_force_host_platform_device_count=N`` — real collectives, real
partitioning, shared host FLOPs (so absolute numbers are meaningless
but the parallel-efficiency trend and the collective structure are
real). Run: ``python scripts/scaling_bench.py``.

Measures the dense graph-axis layout (fully local per-graph compute,
gradient psum only — see `parallel.mesh.dense_batch_shardings`) and the
sparse (dp, ep) layout (GSPMD-derived collectives) at a fixed GLOBAL
batch, i.e. strong scaling. Appends a JSON line per point; the table
lives in SCALING.md.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_point(n_devices: int, layout: str) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    env["_SCALING_CHILD"] = f"{n_devices}:{layout}"
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def child(n_devices: int, layout: str) -> None:
    import time

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import optax

    sys.path.insert(0, REPO)
    from bench import NODE_FEATS, build_graphs
    from deeprank_gnn_tpu.models import GINet
    from deeprank_gnn_tpu.parallel import make_mesh
    from deeprank_gnn_tpu.parallel.mesh import shard_batch, shard_dense_batch
    from deeprank_gnn_tpu.train.losses import mse_loss

    graphs = build_graphs(num_graphs=64)
    if layout == "dense":
        from deeprank_gnn_tpu.data.dense_batch import collate_dense

        batch, _ = collate_dense(graphs)
    else:
        from deeprank_gnn_tpu.data.batch import collate

        batch, _ = collate(graphs, node_mult=8 * n_devices,
                           edge_mult=8 * n_devices)
    real_edges = int(np.asarray(batch.edge_mask).sum())

    model = GINet(NODE_FEATS, 1, 1)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    devices = jax.devices()[:n_devices]

    if layout == "halo":
        from deeprank_gnn_tpu.parallel import halo as H

        hmesh = H.make_halo_mesh(devices)
        hstep = H.make_halo_train_step(model, optimizer, hmesh, task="reg")
        sbatch = H.shard_halo_batch(
            H.partition_batch(batch, n_devices), hmesh
        )
        rng = jax.random.PRNGKey(0)

        def jstep(p, o, b):
            p, o, l, _, _ = hstep(p, o, b, rng)
            return p, o, l

    else:
        mesh = make_mesh(devices)

        def step(params, opt_state, batch):
            def loss_fn(p):
                pred = model.apply(p, batch, training=False).reshape(-1)
                return mse_loss(pred, batch.y, batch.y_mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        jstep = jax.jit(step)
        sbatch = (
            shard_dense_batch(batch, mesh)
            if layout == "dense"
            else shard_batch(batch, mesh)
        )
    p, o, l = jstep(params, opt_state, sbatch)
    _ = float(l)
    steps = 10
    best = float("inf")
    for _w in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            p, o, l = jstep(p, o, sbatch)
        _ = float(l)
        best = min(best, time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "devices": n_devices,
                "layout": layout,
                "ms_per_step": round(best / steps * 1e3, 2),
                "edges_per_s": round(real_edges * steps / best, 1),
            }
        )
    )


def main() -> None:
    spec = os.environ.get("_SCALING_CHILD")
    if spec:
        n, layout = spec.split(":")
        child(int(n), layout)
        return
    rows = []
    for layout in ("dense", "sparse", "halo"):
        base = None
        for n in (1, 2, 4, 8):
            r = run_point(n, layout)
            if base is None:
                base = r["edges_per_s"]
            r["speedup"] = round(r["edges_per_s"] / base, 2)
            rows.append(r)
            print(json.dumps(r))
    # preserve any sections other tooling appended after the table
    # (e.g. the collective-byte audit from scripts/collective_bytes.py)
    path = os.path.join(REPO, "SCALING.md")
    tail = ""
    if os.path.exists(path):
        old = open(path).read()
        marker = "\n## "
        # keep everything from the first section heading AFTER the table
        idx = old.find("\n## Collective")
        if idx >= 0:
            tail = old[idx:]
    with open(path, "w") as fh:
        fh.write(
            "# Strong-scaling curve (virtual CPU mesh — directional)\n\n"
            "Fixed global batch (64 graphs, fixture-scale), full train\n"
            "step. All N virtual devices share ONE host's cores, so\n"
            "wall-clock speedup cannot exceed 1.0 by construction; what\n"
            "the curve measures is the OVERHEAD the partitioning adds:\n\n"
            "- dense graph-axis layout: flat (~1.0) — partitioning adds\n"
            "  no cross-device traffic beyond the gradient psum, as\n"
            "  designed (`parallel.mesh.dense_batch_shardings`). On real\n"
            "  chips per-device compute shrinks 1/N against a constant\n"
            "  tiny psum -> near-linear scaling expected.\n"
            "- sparse (dp, ep) layout: GSPMD-derived collectives between\n"
            "  the edge and node shardings cost real time that grows\n"
            "  with device count — the measured degradation is that\n"
            "  collective overhead.\n"
            "- halo layout (`parallel/halo.py`): the explicit design —\n"
            "  row-range edge partitioning (scatters fully local),\n"
            "  host-planned boundary all-to-all overlapping local\n"
            "  aggregation, one fused all_gather for the cross-shard\n"
            "  pooling combine: 2 collectives per paper-mode GINet\n"
            "  forward. On this virtual mesh every collective serializes\n"
            "  through one host process, so per-collective LATENCY (not\n"
            "  volume) sets these numbers; on real ICI the halo moves\n"
            "  only boundary rows where GSPMD re-materializes node\n"
            "  arrays. Graph-local batches (this workload) should prefer\n"
            "  dense; halo is the path for graphs larger than one chip.\n\n"
            "Collective-structure proofs:\n"
            "`tests/test_dense_layout.py::"
            "test_dense_mesh_step_has_no_large_allgather`,\n"
            "`tests/test_halo.py::test_halo_collective_structure`\n"
            "(all-to-all present; all-gathers bounded by cluster-level\n"
            "arrays).\n\n"
            "| layout | devices | ms/step | edges/s | speedup |\n"
            "|---|---|---|---|---|\n"
        )
        for r in rows:
            fh.write(
                f"| {r['layout']} | {r['devices']} | {r['ms_per_step']} "
                f"| {r['edges_per_s']} | {r['speedup']} |\n"
            )
        if tail:
            fh.write(tail)
    print("wrote SCALING.md")


if __name__ == "__main__":
    main()
