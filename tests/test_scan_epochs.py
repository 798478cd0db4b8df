"""Scanned epochs (`train/scan.py` + `NeuralNet(scan_epochs=True)`).

One lax.scan'd XLA execution per epoch must reproduce the per-batch
looped training exactly: same batch order (shared seeded shuffle), same
PRNG threading (one split per batch), same losses, params, predictions
and exported epoch data. The reference dispatches every batch from
Python (reference `NeuralNet.py:477-523`); it has no compiled-epoch
analog.
"""

import numpy as np
import pytest

from deeprank_gnn_tpu.data.batch import GraphLoader
from deeprank_gnn_tpu.data.dataset import HDF5DataSet
from deeprank_gnn_tpu.models import GINet
from deeprank_gnn_tpu.train.neuralnet import NeuralNet


def _dataset(path, target="irmsd"):
    return HDF5DataSet(
        database=str(path),
        node_feature=["type", "polarity", "bsa"],
        edge_feature=["dist"],
        target=target,
        clustering_method="mcl",
    )


def test_epoch_plan_matches_iterated_epoch(fixture_hdf5):
    ds = _dataset(fixture_hdf5)
    it = GraphLoader(
        ds, batch_size=4, shuffle=True, seed=3, layout="dense",
        device_cache=True,
    )
    pl = GraphLoader(
        ds, batch_size=4, shuffle=True, seed=3, layout="dense",
        device_cache=True,
    )
    iterated = list(it)
    slots, mols_per_batch = pl.device_epoch_plan()
    assert slots.shape == (len(iterated), 4)
    assert [m for _, m in iterated] == mols_per_batch
    assert it.padding_stats == pl.padding_stats
    # same RNG stream: the NEXT epoch's order must also agree
    iterated2 = [m for _, m in it]
    _, mols2 = pl.device_epoch_plan()
    assert iterated2 == mols2


def test_scan_epochs_matches_loop_reg(fixture_hdf5, tmp_path):
    kw = dict(
        Net=GINet, target="irmsd", batch_size=4, percent=(0.8, 0.2),
        layout="dense", shuffle=True, seed=0, device_cache=True,
    )
    nn1 = NeuralNet(str(fixture_hdf5), outdir=str(tmp_path / "a"), **kw)
    nn1.train(nepoch=3, validate=True)
    nn2 = NeuralNet(
        str(fixture_hdf5), outdir=str(tmp_path / "b"), scan_epochs=True, **kw
    )
    nn2.train(nepoch=3, validate=True)
    assert np.allclose(nn1.train_loss, nn2.train_loss, rtol=1e-6)
    assert np.allclose(nn1.valid_loss, nn2.valid_loss, rtol=1e-6)
    # identical final parameters: the scan body IS the looped step
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(nn1.params),
        jax.tree_util.tree_leaves(nn2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
    # epoch bookkeeping shape parity
    assert nn1.data["train"]["mol"] == nn2.data["train"]["mol"]
    np.testing.assert_allclose(
        np.asarray(nn1.data["train"]["raw_outputs"], dtype=np.float32),
        np.asarray(nn2.data["train"]["raw_outputs"], dtype=np.float32),
        rtol=1e-4, atol=1e-5,
    )


def test_scan_epochs_class_task(fixture_hdf5, tmp_path):
    kw = dict(
        Net=GINet, target="binclass", task="class", classes=[0, 1],
        batch_size=4, percent=(1.0, 0.0), layout="dense", shuffle=True,
        seed=0, device_cache=True,
    )
    nn1 = NeuralNet(str(fixture_hdf5), outdir=str(tmp_path / "a"), **kw)
    nn1.train(nepoch=2)
    nn2 = NeuralNet(
        str(fixture_hdf5), outdir=str(tmp_path / "b"), scan_epochs=True, **kw
    )
    nn2.train(nepoch=2)
    assert np.allclose(nn1.train_loss, nn2.train_loss, rtol=1e-6)
    assert nn1.data["train"]["outputs"] == nn2.data["train"]["outputs"]
    assert nn1.data["train"]["targets"] == nn2.data["train"]["targets"]


def test_scan_epochs_test_pass(fixture_hdf5, tmp_path):
    kw = dict(
        Net=GINet, target="irmsd", batch_size=4, percent=(1.0, 0.0),
        layout="dense", shuffle=False, seed=0, device_cache=True,
    )
    nn = NeuralNet(
        str(fixture_hdf5), outdir=str(tmp_path), scan_epochs=True, **kw
    )
    nn.train(nepoch=1)
    nn.test(str(fixture_hdf5))
    assert nn.test_y is not None and len(nn.test_out) == 10


def test_scan_epochs_requires_device_cache(fixture_hdf5, tmp_path):
    with pytest.raises(ValueError):
        NeuralNet(
            str(fixture_hdf5), Net=GINet, target="irmsd", layout="dense",
            outdir=str(tmp_path), scan_epochs=True,
        )


def test_scan_epochs_on_mesh_matches_single_device(fixture_hdf5, tmp_path):
    """Scanned MULTI-CHIP epochs: the replicated store gathers locally,
    the batch is sharding-constrained to the graph axis inside the scan
    body, gradients all-reduce — losses must match the single-device
    scan to fp32 rounding."""
    import jax
    import numpy as np

    from deeprank_gnn_tpu.parallel import make_mesh

    kw = dict(
        Net=GINet, target="irmsd", batch_size=8, percent=(0.8, 0.2),
        layout="dense", shuffle=True, seed=0, device_cache=True,
        scan_epochs=True,
    )
    nn1 = NeuralNet(str(fixture_hdf5), outdir=str(tmp_path / "a"), **kw)
    nn1.train(nepoch=2, validate=True)
    mesh = make_mesh(jax.devices())
    nn2 = NeuralNet(
        str(fixture_hdf5), outdir=str(tmp_path / "b"), mesh=mesh, **kw
    )
    nn2.train(nepoch=2, validate=True)
    np.testing.assert_allclose(nn1.train_loss, nn2.train_loss, rtol=1e-5)
    np.testing.assert_allclose(nn1.valid_loss, nn2.valid_loss, rtol=1e-5)


def test_scan_epochs_mesh_batch_divisibility(fixture_hdf5, tmp_path):
    import jax

    from deeprank_gnn_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices())
    with pytest.raises(ValueError, match="divisible"):
        NeuralNet(
            str(fixture_hdf5), Net=GINet, target="irmsd", layout="dense",
            batch_size=3, outdir=str(tmp_path), device_cache=True,
            scan_epochs=True, mesh=mesh,
        )


def test_chunked_scan_on_mesh_matches_single_device(fixture_hdf5, tmp_path):
    """device_cache='chunked' + mesh (VERDICT r4 item 6): each rotating
    chunk uploads replicated and runs as one scanned multi-chip
    dispatch — losses bit-comparable to the single-device chunked
    scan."""
    import jax
    import numpy as np

    from deeprank_gnn_tpu.parallel import make_mesh

    kw = dict(
        Net=GINet, target="irmsd", batch_size=8, percent=(0.8, 0.2),
        layout="dense", shuffle=True, seed=0, device_cache="chunked",
        scan_epochs=True, device_cache_bytes=200_000,  # force >1 chunk
    )
    nn1 = NeuralNet(str(fixture_hdf5), outdir=str(tmp_path / "a"), **kw)
    nn1.train(nepoch=2, validate=True)
    mesh = make_mesh(jax.devices())
    nn2 = NeuralNet(
        str(fixture_hdf5), outdir=str(tmp_path / "b"), mesh=mesh, **kw
    )
    nn2.train(nepoch=2, validate=True)
    assert np.isfinite(nn1.train_loss).all()
    np.testing.assert_allclose(nn1.train_loss, nn2.train_loss, rtol=1e-5)
    np.testing.assert_allclose(nn1.valid_loss, nn2.valid_loss, rtol=1e-5)


def test_chunked_mesh_requires_scan(fixture_hdf5, tmp_path):
    import jax
    import pytest

    from deeprank_gnn_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="chunked"):
        NeuralNet(
            str(fixture_hdf5), Net=GINet, target="irmsd", layout="dense",
            batch_size=8, outdir=str(tmp_path), device_cache="chunked",
            mesh=make_mesh(jax.devices()),
        )
