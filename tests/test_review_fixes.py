"""Regression tests for code-review findings."""

import h5py
import numpy as np
import pytest


def test_edge_feature_all(fixture_hdf5):
    from deeprank_gnn_tpu.data import HDF5DataSet

    ds = HDF5DataSet(
        database=fixture_hdf5,
        node_feature=["type"],
        edge_feature="all",
        target="irmsd",
        tqdm=False,
    )
    s = ds.get(0)
    # fixture edge_data has dist + polarity + type(string); numeric
    # ones stack ('type' strings would fail hstack -> dist, polarity)
    assert s.edge_attr.shape[1] >= 1


def test_empty_internal_edges_roundtrip(tmp_path):
    """A graph with zero internal edges must write a (0,2) index and
    load back (previously silently dropped + deleted by PreCluster)."""
    from deeprank_gnn_tpu.featurize.graph import Graph
    from deeprank_gnn_tpu.data import HDF5DataSet

    g = Graph()
    g.name = "empty_internal"
    g.nodes = [("A", 1, "ALA"), ("B", 2, "GLY")]
    g.node_data = {
        "chain": [0, 1],
        "pos": [np.zeros(3), np.ones(3)],
        "feat": [1.0, 2.0],
    }
    g.edges = [(g.nodes[0], g.nodes[1])]
    g.edge_data = {"dist": [3.0], "type": [b"interface"]}
    g.score = {"irmsd": 5.0}
    out = tmp_path / "empty.hdf5"
    with h5py.File(out, "w") as f5:
        g.nx2h5(f5)
    with h5py.File(out) as f:
        assert f["empty_internal/internal_edge_index"].shape == (0, 2)
    ds = HDF5DataSet(
        database=str(out), node_feature=["feat"], target="irmsd", tqdm=False
    )
    s = ds.load_one_graph(str(out), "empty_internal")
    assert s is not None
    assert s.internal_edge_index.shape == (2, 0)


def test_metrics_alignment_with_missing_targets(tmp_path, fixture_hdf5):
    """Graphs without the target must not shift (pred, y) pairs."""
    from deeprank_gnn_tpu import NeuralNet
    from deeprank_gnn_tpu.models import GINet

    # remove the target from two molecules
    with h5py.File(fixture_hdf5, "a") as f:
        del f["1ATN_2w/score/irmsd"]
        del f["1ATN_7w/score/irmsd"]

    nn = NeuralNet(
        fixture_hdf5,
        GINet,
        node_feature=["type", "polarity", "bsa"],
        target="irmsd",
        batch_size=10,
        percent=[1.0, 0.0],
        outdir=str(tmp_path),
    )
    nn.train(nepoch=1)  # would crash on misaligned metrics before
    assert len(nn.train_y) == 8
    m = nn.get_metrics("train", 4.0)
    assert len(m.prediction) == len(m.y) == 8
    # exports still cover all 10 molecules
    assert len(nn.data["train"]["outputs"]) == 10


def test_make_mesh_partial_spec():
    import jax

    from deeprank_gnn_tpu.parallel import make_mesh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    m = make_mesh(devs, dp=8)
    assert dict(zip(m.axis_names, m.devices.shape)) == {"dp": 8, "ep": 1}
    m = make_mesh(devs, ep=4)
    assert dict(zip(m.axis_names, m.devices.shape)) == {"dp": 2, "ep": 4}
    with pytest.raises(ValueError):
        make_mesh(devs, ep=3)


def test_graphgen_mp_survives_bad_pdb(tmp_path):
    import shutil

    from deeprank_gnn_tpu.featurize.graphgen import GraphHDF5

    pdb_dir = tmp_path / "pdb"
    pdb_dir.mkdir()
    shutil.copy(
        "/root/reference/tests/data/pdb/1ATN/1ATN_1w.pdb", pdb_dir / "1ATN_1w.pdb"
    )
    with open(pdb_dir / "1ATN_2w.pdb", "w") as f:
        f.write("GARBAGE NOT A PDB\n")
    out = str(tmp_path / "g.hdf5")
    GraphHDF5(
        pdb_path=str(pdb_dir),
        pssm_path="/root/reference/tests/data/pssm/1ATN",
        outfile=out,
        nproc=2,
    )
    with h5py.File(out) as f:
        assert list(f.keys()) == ["1ATN_1w"]


def test_bsa_reuses_precomputed_sasa(monkeypatch):
    """get_contact_residue_sasa must not recompute what get_structure
    already produced."""
    import deeprank_gnn_tpu.featurize.sasa as sasa_mod
    from deeprank_gnn_tpu.featurize.bsa import BSA

    bsa = BSA("/root/reference/tests/data/pdb/1ATN/1ATN_1w.pdb")
    bsa.get_structure()
    calls = []
    orig = sasa_mod.residue_sasa
    monkeypatch.setattr(
        sasa_mod, "residue_sasa", lambda *a, **k: calls.append(1) or orig(*a, **k)
    )
    bsa.get_contact_residue_sasa()
    assert not calls  # all SASA maps came from get_structure
