"""Checkpoint/resume semantics and remaining task variants:
multiclass capri training, sigmoid transform, GINet repaired-attention
mode, profiler trace capture."""

import os

import numpy as np
import pytest

from deeprank_gnn_tpu import NeuralNet
from deeprank_gnn_tpu.models import GINet

NODE_FEATS = ["type", "polarity", "bsa"]


def test_resume_continues_training(tmp_path, fixture_hdf5):
    nn = NeuralNet(
        fixture_hdf5,
        GINet,
        node_feature=NODE_FEATS,
        target="irmsd",
        batch_size=10,
        percent=[1.0, 0.0],
        outdir=str(tmp_path),
    )
    nn.train(nepoch=2)
    ck = str(tmp_path / "resume.pth.tar")
    nn.save_model(ck)

    nn2 = NeuralNet(fixture_hdf5, GINet, pretrained_model=ck, outdir=str(tmp_path))
    # history restored
    assert nn2.train_loss == nn.train_loss
    # optimizer moments restored (not reinitialized)
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(nn.opt_state),
        jax.tree_util.tree_leaves(nn2.opt_state),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # training continues (loss history appends)
    nn2.train(nepoch=1)
    assert len(nn2.train_loss) == 3
    assert np.isfinite(nn2.train_loss).all()


def test_capri_multiclass_training(tmp_path, fixture_hdf5):
    """5-class CAPRI classification (classes [1..5])."""
    from deeprank_gnn_tpu.tools import add_target

    # fixture lacks capri_class; derive it from irmsd like the
    # reference scorer does (Graph.py:56-59)
    import h5py

    with h5py.File(fixture_hdf5, "a") as f:
        for mol in f:
            irmsd = f[mol]["score/irmsd"][()]
            capri = 5
            for thr, val in zip([6.0, 4.0, 2.0, 1.0], [4, 3, 2, 1]):
                if irmsd < thr:
                    capri = val
            f[mol]["score"].create_dataset("capri_class", data=capri)

    nn = NeuralNet(
        fixture_hdf5,
        GINet,
        node_feature=NODE_FEATS,
        target="capri_class",
        task="class",
        classes=[1, 2, 3, 4, 5],
        threshold=4,
        batch_size=10,
        percent=[1.0, 0.0],
        outdir=str(tmp_path),
    )
    nn.train(nepoch=2)
    assert nn.output_shape == 5
    assert np.isfinite(nn.train_loss).all()
    assert set(nn.data["train"]["outputs"]).issubset({1, 2, 3, 4, 5})

    # end-to-end through test() -> multiclass Metrics -> CSV export
    # (reference surface: NeuralNet.py:67, Metrics.py:103-135)
    from deeprank_gnn_tpu.tools import hdf5_to_csv

    nn.test(fixture_hdf5, threshold=4)
    assert np.isfinite(nn.test_loss)
    assert set(nn.test_out).issubset({1, 2, 3, 4, 5})
    assert set(nn.test_y).issubset({1, 2, 3, 4, 5})
    # multiclass metrics are PER-CLASS arrays (reference
    # Metrics.py:136-176 semantics)
    m = nn.get_metrics("test", threshold=4, binary=False)
    acc = np.asarray(m.accuracy, dtype=float)
    assert acc.shape == (5,) and ((acc >= 0) & (acc <= 1)).all()
    mb = nn.get_metrics("test", threshold=4)  # binarized at capri<=4
    assert 0.0 <= float(mb.accuracy) <= 1.0
    out = os.path.join(str(tmp_path), "test_data.hdf5")
    csv = hdf5_to_csv(out)
    import csv as csvmod

    with open(csv) as f:
        rows = list(csvmod.reader(f))
    # header + one row per molecule; raw per-class probabilities added
    assert len(rows) == 1 + len(nn.test_out)
    assert any("raw" in c for c in rows[0])


def test_transform_sigmoid(tmp_path, fixture_hdf5):
    nn = NeuralNet(
        fixture_hdf5,
        GINet,
        node_feature=NODE_FEATS,
        target="fnat",
        batch_size=10,
        percent=[1.0, 0.0],
        transform_sigmoid=True,
        outdir=str(tmp_path),
    )
    nn.train(nepoch=1)
    preds = np.asarray(nn.data["train"]["outputs"])
    assert ((preds >= 0) & (preds <= 1)).all()


def test_ginet_attention_mode(fixture_hdf5):
    """Repaired attention (segment softmax) must differ from the
    paper-parity constant-attention forward."""
    import jax

    from deeprank_gnn_tpu.data import HDF5DataSet, collate

    ds = HDF5DataSet(
        database=fixture_hdf5, node_feature=NODE_FEATS, target="irmsd",
        tqdm=False,
    )
    graphs = [ds.get(i) for i in range(3)]
    batch, _ = collate(graphs)
    m_plain = GINet(graphs[0].num_features, 1, 1)
    m_att = GINet(graphs[0].num_features, 1, 1, attention=True)
    params = m_plain.init(jax.random.PRNGKey(0))
    out_plain = np.asarray(m_plain.apply(params, batch))[:3]
    out_att = np.asarray(m_att.apply(params, batch))[:3]
    assert np.isfinite(out_att).all()
    assert not np.allclose(out_plain, out_att)


def test_profile_trace(tmp_path, fixture_hdf5):
    nn = NeuralNet(
        fixture_hdf5,
        GINet,
        node_feature=NODE_FEATS,
        target="irmsd",
        batch_size=10,
        percent=[1.0, 0.0],
        outdir=str(tmp_path),
    )
    trace_dir = str(tmp_path / "trace")
    nn.train(nepoch=2, profile=trace_dir)
    # a plugins/profile/<ts>/ tree with trace files appears
    found = []
    for root, _dirs, files in os.walk(trace_dir):
        found += files
    assert found, "no profiler trace captured"
