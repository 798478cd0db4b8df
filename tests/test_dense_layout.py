"""Dense (per-graph MXU) layout must reproduce the sparse layout's
numerics exactly for all three model families, and train end to end."""

import numpy as np
import jax
import pytest

from deeprank_gnn_tpu.data import HDF5DataSet, collate
from deeprank_gnn_tpu.data.dense_batch import collate_dense
from deeprank_gnn_tpu.models import GINet, FoutNet, sGAT

NODE_FEATS = ["type", "polarity", "bsa", "depth", "hse", "ic", "pssm"]


@pytest.fixture(scope="module")
def graphs():
    ds = HDF5DataSet(
        database="/root/reference/tests/hdf5/1ATN_residue.hdf5",
        node_feature=NODE_FEATS,
        edge_feature=["dist"],
        target="irmsd",
        tqdm=False,
    )
    return [ds.get(i) for i in range(5)]


@pytest.mark.parametrize("model_cls", [GINet, FoutNet, sGAT])
def test_dense_matches_sparse(graphs, model_cls):
    model = model_cls(graphs[0].num_features, 1, 1)
    params = model.init(jax.random.PRNGKey(7))
    sparse_batch, _ = collate(graphs)
    dense_batch, _ = collate_dense(graphs)
    out_sparse = np.asarray(model.apply(params, sparse_batch))[: len(graphs)]
    out_dense = np.asarray(model.apply(params, dense_batch))[: len(graphs)]
    np.testing.assert_allclose(out_dense, out_sparse, rtol=2e-4, atol=1e-5)


def test_dense_gradients_match_sparse(graphs):
    import jax.numpy as jnp

    model = GINet(graphs[0].num_features, 1, 1)
    params = model.init(jax.random.PRNGKey(3))
    sparse_batch, _ = collate(graphs)
    dense_batch, _ = collate_dense(graphs)

    def loss(p, b):
        return jnp.sum(model.apply(p, b).reshape(-1)[: len(graphs)] ** 2)

    gs = jax.grad(loss)(params, sparse_batch)
    gd = jax.grad(loss)(params, dense_batch)
    for a, b in zip(jax.tree_util.tree_leaves(gs), jax.tree_util.tree_leaves(gd)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5
        )


def test_dense_training_end_to_end(tmp_path, fixture_hdf5):
    from deeprank_gnn_tpu import NeuralNet

    nn = NeuralNet(
        fixture_hdf5,
        GINet,
        node_feature=NODE_FEATS,
        target="irmsd",
        batch_size=10,
        percent=[1.0, 0.0],
        outdir=str(tmp_path),
        layout="dense",
    )
    nn.train(nepoch=2)
    assert np.isfinite(nn.train_loss).all()
