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
    from deeprank_gnn_tpu.parallel.distributed import initialize

    initialize(coordinator, nprocs, pid)
    assert jax.process_count() == nprocs
    n_global = len(jax.devices())

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


if __name__ == "__main__":
    main()
