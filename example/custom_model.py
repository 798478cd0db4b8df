"""Build and train a custom GNN outside the NeuralNet engine.

Equivalent of reference `example/model.py` (which wires a custom conv
with on-line graclus/community clustering): demonstrates the low-level
API — datasets, loaders, param pytrees, jitted steps — for users who
want full control.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deeprank_gnn_tpu.data import HDF5DataSet, GraphLoader
from deeprank_gnn_tpu.models.common import linear, linear_init, uniform_init
from deeprank_gnn_tpu.ops import (
    gather,
    graph_mean_pool,
    community_pooling_x,
    max_pool_x,
    segment_sum,
)
from deeprank_gnn_tpu.train.losses import mse_loss

H5 = "./1ATN_residue.hdf5"


def init_params(rng, num_features):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    fc1_w, fc1_b = linear_init(k3, 32, 64)
    fc2_w, fc2_b = linear_init(k4, 64, 1)
    return {
        "w1": uniform_init(k1, (16, num_features), num_features),
        "w2": uniform_init(k2, (32, 16), 16),
        "fc1_w": fc1_w,
        "fc1_b": fc1_b,
        "fc2_w": fc2_w,
        "fc2_b": fc2_b,
    }


def forward(params, batch):
    """A simple edge-weighted conv -> two-level pooled readout."""
    row, col = batch.edge_index[0], batch.edge_index[1]
    n, c0, c1, g = (
        batch.num_nodes,
        batch.num_clusters0,
        batch.num_clusters1,
        batch.num_graphs,
    )
    h = batch.x @ params["w1"].T
    msg = gather(h, col) * batch.edge_attr  # distance-weighted messages
    h = jax.nn.relu(segment_sum(msg, row, n))
    h = community_pooling_x(h, batch.assign0, c0)
    h2 = h @ params["w2"].T
    pe_row, pe_col = batch.pe_index[0], batch.pe_index[1]
    msg2 = gather(h2, pe_col)
    h2 = jax.nn.relu(segment_sum(msg2, pe_row, c0))
    hq = max_pool_x(h2, batch.assign1, c1)
    out = graph_mean_pool(hq, batch.pool1_graph, g)
    out = jax.nn.relu(linear(out, params["fc1_w"], params["fc1_b"]))
    return linear(out, params["fc2_w"], params["fc2_b"])


if __name__ == "__main__":
    dataset = HDF5DataSet(
        database=H5,
        node_feature=["type", "polarity", "bsa"],
        edge_feature=["dist"],
        target="irmsd",
        tqdm=False,
    )
    # the low-level loader needs the two-level clusters; NeuralNet does
    # this automatically, here we pre-cluster explicitly (cached into
    # the HDF5 — a no-op on later runs)
    from deeprank_gnn_tpu import PreCluster

    PreCluster(dataset, method="mcl")
    loader = GraphLoader(dataset, batch_size=4, shuffle=True)
    params = init_params(jax.random.PRNGKey(0), dataset.get(0).num_features)
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            pred = forward(p, batch).reshape(-1)
            return mse_loss(pred, batch.y, batch.y_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(1, 20):
        losses = []
        for batch, mols in loader:
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
        print(f"Epoch {epoch:02d}  loss {np.mean(losses):.4f}")
