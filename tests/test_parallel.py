"""Multi-device training over a virtual 8-CPU-device mesh.

The reference has no distributed capability at all (SURVEY §2.4); this
asserts the mesh path is numerically equivalent to single-device."""

import numpy as np
import jax
import pytest

from deeprank_gnn_tpu import NeuralNet
from deeprank_gnn_tpu.models import GINet
from deeprank_gnn_tpu.parallel import make_mesh

NODE_FEATS = ["type", "polarity", "bsa", "depth", "hse", "ic", "pssm"]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_training_matches_single_device(tmp_path, fixture_hdf5):
    common = dict(
        node_feature=NODE_FEATS,
        target="irmsd",
        batch_size=10,
        percent=[1.0, 0.0],
        shuffle=False,
        seed=11,
        outdir=str(tmp_path),
    )
    nn1 = NeuralNet(fixture_hdf5, GINet, **common)
    nn1.train(nepoch=2)

    mesh = make_mesh(jax.devices())  # (dp=4, ep=2)
    nn2 = NeuralNet(fixture_hdf5, GINet, mesh=mesh, **common)
    nn2.train(nepoch=2)

    np.testing.assert_allclose(nn1.train_loss, nn2.train_loss, rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(nn1.params),
        jax.tree_util.tree_leaves(nn2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_eval(tmp_path, fixture_hdf5):
    mesh = make_mesh(jax.devices(), dp=8, ep=1)
    nn = NeuralNet(
        fixture_hdf5,
        GINet,
        node_feature=NODE_FEATS,
        target="irmsd",
        batch_size=10,
        percent=[0.8, 0.2],
        mesh=mesh,
        outdir=str(tmp_path),
    )
    nn.train(nepoch=1, validate=True)
    assert np.isfinite(nn.valid_loss).all()
