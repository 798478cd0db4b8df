"""Device-resident graph store (`data/device_store.py`).

The dense layout's leading graph axis lets the whole dataset live on
device; batches are assembled by an on-device gather. These tests pin
the store path to the streaming collate path exactly (same batches,
same losses) — the reference has no device cache at all (it re-collates
on host every epoch, reference `NeuralNet.py:490-493`).
"""

import dataclasses
import os

import numpy as np
import pytest

from deeprank_gnn_tpu.data.batch import GraphLoader
from deeprank_gnn_tpu.data.dataset import HDF5DataSet


def _dataset(path):
    return HDF5DataSet(
        database=str(path),
        node_feature=["type", "polarity", "bsa"],
        edge_feature=["dist"],
        target="irmsd",
        clustering_method="mcl",
    )


def test_store_batches_equal_streaming(fixture_hdf5):
    ds = _dataset(fixture_hdf5)
    stream = GraphLoader(ds, batch_size=4, shuffle=False, layout="dense")
    cached = GraphLoader(
        ds, batch_size=4, shuffle=False, layout="dense", device_cache=True
    )
    sb, cb = list(stream), list(cached)
    assert len(sb) == len(cb) == 3
    for (b1, m1), (b2, m2) in zip(sb, cb):
        assert m1 == m2
        for f in dataclasses.fields(b1):
            a1 = np.asarray(getattr(b1, f.name))
            a2 = np.asarray(getattr(b2, f.name))
            assert a1.shape == a2.shape, f.name
            assert np.array_equal(a1, a2), f.name
    # padding stats populated from host-side per-slot counts
    assert cached.padding_stats["num_batches"] == 3
    assert 0 < cached.padding_stats["edge_efficiency"] <= 1


def test_store_reused_across_shuffled_epochs(fixture_hdf5):
    ds = _dataset(fixture_hdf5)
    loader = GraphLoader(
        ds, batch_size=4, shuffle=True, seed=1, layout="dense",
        device_cache=True,
    )
    e1 = [m for _, m in loader]
    store = loader._store
    e2 = [m for _, m in loader]
    assert loader._store is store  # one upload, many epochs
    assert sorted(sum(e1, [])) == sorted(sum(e2, []))
    assert e1 != e2  # reshuffled


def test_budget_fallback_streams(fixture_hdf5):
    ds = _dataset(fixture_hdf5)
    loader = GraphLoader(
        ds, batch_size=4, shuffle=False, layout="dense",
        device_cache=True, device_cache_bytes=1024,
    )
    batches = list(loader)
    assert loader._store is None and loader.device_cache is False
    assert len(batches) == 3  # streaming fallback still serves the epoch


def test_device_cache_requires_dense(fixture_hdf5):
    ds = _dataset(fixture_hdf5)
    with pytest.raises(ValueError):
        GraphLoader(ds, layout="sparse", device_cache=True)


def test_neuralnet_device_cache_matches_streaming(fixture_hdf5, tmp_path):
    from deeprank_gnn_tpu.models import GINet
    from deeprank_gnn_tpu.train.neuralnet import NeuralNet

    kw = dict(
        Net=GINet, target="irmsd", batch_size=4, percent=(0.8, 0.2),
        layout="dense", shuffle=True, seed=0,
    )
    nn1 = NeuralNet(str(fixture_hdf5), outdir=str(tmp_path / "a"), **kw)
    nn1.train(nepoch=2, validate=True)
    nn2 = NeuralNet(
        str(fixture_hdf5), outdir=str(tmp_path / "b"), device_cache=True, **kw
    )
    nn2.train(nepoch=2, validate=True)
    assert np.allclose(nn1.train_loss, nn2.train_loss, rtol=1e-6)
    assert np.allclose(nn1.valid_loss, nn2.valid_loss, rtol=1e-6)


def test_device_cache_on_mesh_matches_streaming(fixture_hdf5, tmp_path):
    """Mesh runs replicate the store across chips: the batch gather is
    device-local and the step's input resharding slices locally — a
    multi-chip epoch with no host link."""
    import jax
    from deeprank_gnn_tpu.models import GINet
    from deeprank_gnn_tpu.parallel import make_mesh
    from deeprank_gnn_tpu.train.neuralnet import NeuralNet

    mesh = make_mesh(jax.devices())
    kw = dict(
        Net=GINet, target="irmsd", batch_size=8, percent=(0.8, 0.2),
        layout="dense", shuffle=True, seed=0, mesh=mesh,
    )
    nn1 = NeuralNet(str(fixture_hdf5), outdir=str(tmp_path / "a"), **kw)
    nn1.train(nepoch=2, validate=True)
    nn2 = NeuralNet(
        str(fixture_hdf5), outdir=str(tmp_path / "b"),
        device_cache=True, **kw,
    )
    nn2.train(nepoch=2, validate=True)
    assert np.allclose(nn1.train_loss, nn2.train_loss, rtol=1e-5)
    assert np.allclose(nn1.valid_loss, nn2.valid_loss, rtol=1e-5)
