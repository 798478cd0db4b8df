"""Whole-run scanned training (`train/scan.py` make_train_scan +
`NeuralNet(scan_epochs="full")`).

ALL epochs of a `train()` call execute as ONE XLA program — per-epoch
validation and best-model selection included — and must reproduce the
per-epoch-scan path (itself pinned against the per-batch loop in
`tests/test_scan_epochs.py`) exactly: same losses, params, predictions,
exported epoch data and best checkpoint. The reference dispatches every
batch from Python (reference `NeuralNet.py:265-355`).
"""

import os

import numpy as np
import pytest

import jax

from deeprank_gnn_tpu.models import GINet
from deeprank_gnn_tpu.train.neuralnet import NeuralNet


def _assert_params_equal(p1, p2, rtol=1e-6):
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=1e-7
        )


def test_full_scan_matches_per_epoch_scan_reg(fixture_hdf5, tmp_path):
    kw = dict(
        Net=GINet, target="irmsd", batch_size=4, percent=(0.8, 0.2),
        layout="dense", shuffle=True, seed=0, device_cache=True,
    )
    nn1 = NeuralNet(
        str(fixture_hdf5), outdir=str(tmp_path / "a"), scan_epochs=True, **kw
    )
    nn1.train(nepoch=3, validate=True)
    nn2 = NeuralNet(
        str(fixture_hdf5), outdir=str(tmp_path / "b"), scan_epochs="full", **kw
    )
    nn2.train(nepoch=3, validate=True)
    np.testing.assert_allclose(nn1.train_loss, nn2.train_loss, rtol=1e-6)
    np.testing.assert_allclose(nn1.valid_loss, nn2.valid_loss, rtol=1e-6)
    _assert_params_equal(nn1.params, nn2.params)
    assert nn1.data["train"]["mol"] == nn2.data["train"]["mol"]
    assert nn1.data["eval"]["mol"] == nn2.data["eval"]["mol"]
    np.testing.assert_allclose(
        np.asarray(nn1.data["train"]["raw_outputs"], dtype=np.float32),
        np.asarray(nn2.data["train"]["raw_outputs"], dtype=np.float32),
        rtol=1e-4, atol=1e-5,
    )


def test_full_scan_best_checkpoint(fixture_hdf5, tmp_path):
    kw = dict(
        Net=GINet, target="irmsd", batch_size=4, percent=(0.8, 0.2),
        layout="dense", shuffle=True, seed=0, device_cache=True, lr=0.05,
    )
    nn1 = NeuralNet(
        str(fixture_hdf5), outdir=str(tmp_path / "a"), scan_epochs=True, **kw
    )
    nn1.train(nepoch=3, validate=True, save_model="best")
    nn2 = NeuralNet(
        str(fixture_hdf5), outdir=str(tmp_path / "b"), scan_epochs="full", **kw
    )
    nn2.train(nepoch=3, validate=True, save_model="best")
    # the winning epoch's file must exist in BOTH outdirs with the same
    # parameters (the looped path may additionally leave earlier
    # then-best files behind)
    best_epoch = int(np.argmin(nn2.valid_loss)) + 1
    name = nn2._ckpt_name(3, best_epoch)
    f1 = os.path.join(str(tmp_path / "a"), name)
    f2 = os.path.join(str(tmp_path / "b"), name)
    assert os.path.exists(f1), f1
    assert os.path.exists(f2), f2
    r1 = NeuralNet(str(fixture_hdf5), GINet, pretrained_model=f1,
                   outdir=str(tmp_path / "ra"))
    r2 = NeuralNet(str(fixture_hdf5), GINet, pretrained_model=f2,
                   outdir=str(tmp_path / "rb"))
    _assert_params_equal(r1.params, r2.params)


def test_full_scan_class_task_no_validate(fixture_hdf5, tmp_path):
    kw = dict(
        Net=GINet, target="binclass", task="class", classes=[0, 1],
        batch_size=4, percent=(1.0, 0.0), layout="dense", shuffle=True,
        seed=0, device_cache=True,
    )
    nn1 = NeuralNet(
        str(fixture_hdf5), outdir=str(tmp_path / "a"), scan_epochs=True, **kw
    )
    nn1.train(nepoch=2)
    nn2 = NeuralNet(
        str(fixture_hdf5), outdir=str(tmp_path / "b"), scan_epochs="full", **kw
    )
    nn2.train(nepoch=2)
    np.testing.assert_allclose(nn1.train_loss, nn2.train_loss, rtol=1e-6)
    assert nn1.data["train"]["outputs"] == nn2.data["train"]["outputs"]
    assert nn1.data["train"]["targets"] == nn2.data["train"]["targets"]


def test_full_scan_save_epoch_all_exports(fixture_hdf5, tmp_path):
    import h5py

    kw = dict(
        Net=GINet, target="irmsd", batch_size=4, percent=(1.0, 0.0),
        layout="dense", shuffle=True, seed=0, device_cache=True,
    )
    nn = NeuralNet(
        str(fixture_hdf5), outdir=str(tmp_path), scan_epochs="full", **kw
    )
    nn.train(nepoch=3, save_epoch="all")
    with h5py.File(os.path.join(str(tmp_path), "train_data.hdf5")) as f:
        assert {"epoch_0001", "epoch_0002", "epoch_0003"} <= set(f.keys())
        assert len(f["epoch_0002/train/outputs"]) == 10


def test_full_scan_rejects_bad_flag(fixture_hdf5, tmp_path):
    with pytest.raises(ValueError):
        NeuralNet(
            str(fixture_hdf5), Net=GINet, target="irmsd", layout="dense",
            device_cache=True, outdir=str(tmp_path), scan_epochs="banana",
        )


def test_scan_unroll_matches_rolled(fixture_hdf5, tmp_path):
    """unroll replicates the scan body inside the compiled loop — the
    numerics (losses, params) must be identical to the rolled loop."""
    kw = dict(
        Net=GINet, target="irmsd", batch_size=2, percent=(0.8, 0.2),
        layout="dense", shuffle=True, seed=0, device_cache=True,
        scan_epochs="full",
    )
    nn1 = NeuralNet(str(fixture_hdf5), outdir=str(tmp_path / "a"), **kw)
    nn1.train(nepoch=2, validate=True)
    nn2 = NeuralNet(
        str(fixture_hdf5), outdir=str(tmp_path / "b"), scan_unroll=4, **kw
    )
    nn2.train(nepoch=2, validate=True)
    np.testing.assert_allclose(nn1.train_loss, nn2.train_loss, rtol=1e-6)
    np.testing.assert_allclose(nn1.valid_loss, nn2.valid_loss, rtol=1e-6)
    _assert_params_equal(nn1.params, nn2.params)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_full_scan_on_mesh_matches_single_device(fixture_hdf5, tmp_path):
    """scan_epochs='full' on a mesh: the whole multi-epoch run — every
    epoch, validation, best-selection — as ONE sharded program over the
    graph-axis-partitioned batch, numerically matching the
    single-device full scan (the gradient all-reduce is the only
    collective, so the math is identical)."""
    from deeprank_gnn_tpu.parallel import make_mesh

    kw = dict(
        Net=GINet, target="irmsd", batch_size=4, percent=(0.8, 0.2),
        layout="dense", shuffle=True, seed=0, device_cache=True,
        scan_epochs="full",
    )
    nn1 = NeuralNet(str(fixture_hdf5), outdir=str(tmp_path / "a"), **kw)
    nn1.train(nepoch=3, validate=True, save_model="best")
    mesh = make_mesh(jax.devices()[:4], dp=4, ep=1)
    nn2 = NeuralNet(
        str(fixture_hdf5), outdir=str(tmp_path / "b"), mesh=mesh, **kw
    )
    nn2.train(nepoch=3, validate=True, save_model="best")
    np.testing.assert_allclose(nn1.train_loss, nn2.train_loss, rtol=1e-5)
    np.testing.assert_allclose(nn1.valid_loss, nn2.valid_loss, rtol=1e-5)
    _assert_params_equal(nn1.params, nn2.params, rtol=1e-5)
    # both selected the same best epoch checkpoint
    c1 = [f for f in os.listdir(tmp_path / "a") if f.endswith(".pth.tar")]
    c2 = [f for f in os.listdir(tmp_path / "b") if f.endswith(".pth.tar")]
    assert sorted(c1) == sorted(c2)
