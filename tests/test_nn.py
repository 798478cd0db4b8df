"""End-to-end training tests (mirrors reference `tests/test_nn.py`):
train each model family for 5 epochs on the 1ATN fixture, save and
reload the checkpoint, and exercise plotting."""

import os

import numpy as np
import pytest

from deeprank_gnn_tpu import NeuralNet
from deeprank_gnn_tpu.models import GINet, FoutNet, sGAT

NODE_FEATS = ["type", "polarity", "bsa", "depth", "hse", "ic", "pssm"]


def _model_base_test(
    tmp_path, database, model, task="reg", target="irmsd", plot=False
):
    nn = NeuralNet(
        database,
        model,
        node_feature=NODE_FEATS,
        edge_feature=["dist"],
        target=target,
        index=None,
        task=task,
        batch_size=64,
        percent=[0.8, 0.2],
        outdir=str(tmp_path),
    )
    nn.train(nepoch=5, validate=True)
    assert len(nn.train_loss) == 5
    assert np.isfinite(nn.train_loss).all()

    ckpt = str(tmp_path / "test.pth.tar")
    nn.save_model(ckpt)

    nn_cpy = NeuralNet(database, model, pretrained_model=ckpt)
    # reloaded params match saved ones
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(nn.params),
        jax.tree_util.tree_leaves(nn_cpy.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    if plot:
        nn.plot_scatter()
        nn.plot_loss()
        nn.plot_acc()
        nn.plot_hit_rate(data="train", threshold=nn.threshold)
    return nn


def test_ginet(tmp_path, fixture_hdf5):
    nn = _model_base_test(tmp_path, fixture_hdf5, GINet, plot=True)
    assert (tmp_path / "loss_epoch.png").exists()


def test_ginet_class(tmp_path, fixture_hdf5):
    _model_base_test(
        tmp_path, fixture_hdf5, GINet, task="class", target="binclass"
    )


def test_fout(tmp_path, fixture_hdf5):
    _model_base_test(tmp_path, fixture_hdf5, FoutNet)


def test_sgat(tmp_path, fixture_hdf5):
    _model_base_test(tmp_path, fixture_hdf5, sGAT)


def test_train_export_hdf5(tmp_path, fixture_hdf5):
    import h5py

    nn = NeuralNet(
        fixture_hdf5,
        GINet,
        node_feature=NODE_FEATS,
        target="irmsd",
        batch_size=64,
        percent=[0.8, 0.2],
        outdir=str(tmp_path),
    )
    nn.train(nepoch=1, validate=True, save_epoch="all")
    out = tmp_path / "train_data.hdf5"
    assert out.exists()
    with h5py.File(out, "r") as f:
        grp = f["epoch_0001"]
        assert "train" in grp and "eval" in grp
        assert len(grp["train/outputs"]) == 8
        assert len(grp["train/mol"]) == 8
