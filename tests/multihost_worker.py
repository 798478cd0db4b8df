"""Worker process for the multi-host test: joins a 2-process jax CPU
cluster and runs one sharded GINet training step over the global mesh.

Usage: python multihost_worker.py <coordinator> <num_procs> <pid>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "sparse"
    from deeprank_gnn_tpu.parallel.distributed import initialize

    initialize(coordinator, nprocs, pid)
    assert jax.process_count() == nprocs
    n_global = len(jax.devices())
    if mode == "dense":
        return main_dense(pid, n_global)

    import numpy as np
    import optax

    import __graft_entry__ as ge
    from deeprank_gnn_tpu.data.batch import collate
    from deeprank_gnn_tpu.models import GINet
    from deeprank_gnn_tpu.parallel import make_mesh, make_sharded_train_step
    from deeprank_gnn_tpu.parallel.mesh import shard_batch

    graphs = ge._tiny_graphs(num_graphs=8)
    batch, _ = collate(graphs, node_mult=8 * n_global, edge_mult=8 * n_global)
    model = GINet(input_shape=8, output_shape=1, input_shape_edge=1)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    mesh = make_mesh(jax.devices())
    step = make_sharded_train_step(model, optimizer, mesh, task="reg")
    sbatch = shard_batch(batch, mesh)
    params, opt_state, loss, pred, _ = step(
        params, opt_state, sbatch, jax.random.PRNGKey(1)
    )
    # loss arrives replicated; read the locally-addressable shard
    loss_val = float(loss.addressable_shards[0].data)
    print(
        f"MULTIHOST_OK pid={pid} devices={n_global} "
        f"mesh={dict(zip(mesh.axis_names, mesh.devices.shape))} "
        f"loss={loss_val:.6f}",
        flush=True,
    )


def main_dense(pid: int, n_global: int) -> None:
    """Scalable dense-layout ingest: each process collates ONLY its
    `dense_local_slice` of the global batch (disjoint host data) and
    contributes it via `shard_dense_batch_from_local`; the resulting
    loss must be bit-identical to the full-batch-per-host path."""
    import jax
    import numpy as np
    import optax

    import __graft_entry__ as ge
    from deeprank_gnn_tpu.data.dense_batch import collate_dense
    from deeprank_gnn_tpu.models import GINet
    from deeprank_gnn_tpu.parallel import make_mesh, make_sharded_train_step
    from deeprank_gnn_tpu.parallel.mesh import (
        dense_local_slice,
        shard_dense_batch,
        shard_dense_batch_from_local,
    )

    g = 8
    graphs = ge._tiny_graphs(num_graphs=g)
    mesh = make_mesh(jax.devices())
    sl = dense_local_slice(g, mesh)
    caps = dict(ng=64, eg=256, pg=256, c0g=8, c1g=8)  # ng covers the run-padded layout

    # local ingest: this process touches ONLY graphs[sl]
    local_graphs = graphs[sl]
    local_batch, _ = collate_dense(
        local_graphs,
        g_pad=sl.stop - sl.start,
        num_features=8,
        num_edge_features=1,
        **caps,
    )
    gbatch = shard_dense_batch_from_local(local_batch, mesh, g)

    model = GINet(input_shape=8, output_shape=1, input_shape_edge=1)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = make_sharded_train_step(model, optimizer, mesh, task="reg")
    _, _, loss_local, _, _ = step(
        params, opt_state, gbatch, jax.random.PRNGKey(1)
    )
    loss_local = float(loss_local.addressable_shards[0].data)

    # control: the legacy full-batch-per-host path, same content
    full_batch, _ = collate_dense(
        graphs, g_pad=g, num_features=8, num_edge_features=1, **caps
    )
    fbatch = shard_dense_batch(full_batch, mesh)
    _, _, loss_full, _, _ = step(
        params, opt_state, fbatch, jax.random.PRNGKey(1)
    )
    loss_full = float(loss_full.addressable_shards[0].data)
    assert loss_local == loss_full, (loss_local, loss_full)

    print(
        f"MULTIHOST_DENSE_OK pid={pid} devices={n_global} "
        f"slice={sl.start}:{sl.stop} loss={loss_local:.6f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
