"""Tools tests (mirrors reference `tests/test_tools.py`)."""

import os
import shutil

import h5py
import numpy as np
import pytest

PSSM_3DCONS = "/root/reference/tests/data/pssm/1ATN/1ATN.A.pdb.pssm"


def test_pssm_convert(tmp_path):
    from deeprank_gnn_tpu.tools import pssm_3dcons_to_deeprank

    local = tmp_path / "1ATN.A.pdb.pssm"
    shutil.copy(PSSM_3DCONS, local)
    out = pssm_3dcons_to_deeprank(str(local))
    assert os.path.exists(out)


def test_add_target(fixture_hdf5, tmp_path):
    from deeprank_gnn_tpu.tools import add_target

    target_file = tmp_path / "target.lst"
    with open(target_file, "w") as f:
        for i in range(1, 11):
            f.write(f"1ATN_{i}w {i}\n")
    add_target(fixture_hdf5, "test_target", str(target_file))
    with h5py.File(fixture_hdf5) as f:
        for i in range(1, 11):
            assert f[f"1ATN_{i}w/score/test_target"][()] == i
    # loadable as training target
    from deeprank_gnn_tpu.data import HDF5DataSet

    ds = HDF5DataSet(
        database=fixture_hdf5,
        node_feature=["type"],
        target="test_target",
        tqdm=False,
    )
    assert ds.get(0).y is not None


def test_hdf5_to_csv(tmp_path, fixture_hdf5):
    import csv

    from deeprank_gnn_tpu import NeuralNet
    from deeprank_gnn_tpu.models import GINet
    from deeprank_gnn_tpu.tools import hdf5_to_csv

    nn = NeuralNet(
        fixture_hdf5,
        GINet,
        node_feature=["type", "polarity", "bsa"],
        target="irmsd",
        batch_size=10,
        percent=[1.0, 0.0],
        outdir=str(tmp_path),
    )
    nn.train(nepoch=1, save_epoch="all")
    out = hdf5_to_csv(str(tmp_path / "train_data.hdf5"))
    with open(out) as f:
        rows = list(csv.reader(f))
    assert rows[0][:5] == ["epoch", "set", "model", "targets", "prediction"]
    assert len(rows) == 11  # header + 10 molecules


def test_embedding():
    from deeprank_gnn_tpu.tools import manifold_embedding

    pos = np.random.rand(110, 3)
    for method in ["tsne", "spectral", "mds"]:
        emb = manifold_embedding(pos, method=method)
        assert emb.shape == (110, 2)


def test_graph_plots(tmp_path, fixture_hdf5, monkeypatch):
    from deeprank_gnn_tpu.featurize.graph import Graph

    monkeypatch.chdir(tmp_path)
    g = Graph()
    g.h52nx(fixture_hdf5, "1ATN_1w")
    pos2d, cluster = g.plotly_2d("1ATN", disable_plot=True)
    assert pos2d.shape == (len(g.nodes), 2)
    assert len(cluster) == len(g.nodes)
    pos = g.plotly_3d("1ATN", disable_plot=True)
    assert pos.shape == (len(g.nodes), 3)
    # rendered variants: static PNG + interactive hover-annotated
    # figure (plotly schema; self-contained HTML when the plotly
    # package is absent — reference Graph.py:238-477 capability)
    g.plotly_2d("1ATN", disable_plot=False)
    g.plotly_3d("1ATN", disable_plot=False)
    assert os.path.exists("1ATN_2d.png") and os.path.exists("1ATN_3d.png")
    assert os.path.exists("1ATN_2d.html") and os.path.exists("1ATN_3d.html")
    import json
    import re

    html = open("1ATN_2d.html").read()
    m = re.search(r"var FIG = (\{.*?\});\n", html, re.S)
    if m is None:  # plotly package rendered it natively
        assert "Plotly" in html
    else:
        fig = json.loads(m.group(1))
        # edge traces (internal + interface) + one marker trace per chain
        names = [t.get("name") for t in fig["data"]]
        assert "internal" in names and "interface" in names
        assert "chain A" in names and "chain B" in names
        markers = [t for t in fig["data"] if t["mode"] == "markers"]
        n_marked = sum(len(t["x"]) for t in markers)
        assert n_marked == len(g.nodes)
        # every node hover-annotated with its identity
        assert all(len(t["text"]) == len(t["x"]) for t in markers)
        fig3 = json.loads(
            re.search(
                r"var FIG = (\{.*?\});\n", open("1ATN_3d.html").read(), re.S
            ).group(1)
        )
        assert any(t["type"] == "scatter3d" for t in fig3["data"])
