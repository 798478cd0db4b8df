"""Atom-level interface graphs (`featurize/atom_graph.py`).

A capability extension beyond the residue-only reference (its
`GraphGenMP.py:24` accepts graph_type but implements only 'residue'):
atomic nodes/contacts flow through the SAME HDF5 schema, dataset,
clustering, loaders and models — so the whole TPU stack trains on them
unchanged.
"""

import os

import h5py
import numpy as np
import pytest

PDB_DIR = "/root/reference/tests/data/pdb/1ATN"
PSSM_DIR = "/root/reference/tests/data/pssm/1ATN"
REF_DIR = "/root/reference/tests/data/ref/1ATN"
PDB1 = os.path.join(PDB_DIR, "1ATN_1w.pdb")
PSSM = {
    "A": os.path.join(PSSM_DIR, "1ATN.A.pdb.pssm"),
    "B": os.path.join(PSSM_DIR, "1ATN.B.pdb.pssm"),
}


def test_atom_graph_structure():
    """Atomic graph geometry: heavy interface atoms only, symmetric
    feature-name surface with the residue graphs plus `atomtype`."""
    from deeprank_gnn_tpu.featurize.atom_graph import AtomGraph
    from deeprank_gnn_tpu.featurize.residue_graph import ResidueGraph

    g = AtomGraph(pdb=PDB1, pssm=PSSM)
    rg = ResidueGraph(pdb=PDB1, pssm=PSSM)
    # atomic resolution: more nodes than residues, every node a heavy
    # atom of a valid residue on chain A or B
    assert len(g.nodes) > len(rg.nodes)
    assert all(k[0] in ("A", "B") for k in g.nodes)
    assert all(":" in k[2] for k in g.nodes)  # "RES:ATOM" keys
    assert not any(k[2].endswith(":H") for k in g.nodes)
    # both edge classes present, distances under the cutoffs
    types = [
        t.decode() if isinstance(t, bytes) else t
        for t in g.edge_data["type"]
    ]
    dists = np.asarray(g.edge_data["dist"])
    assert "interface" in types and "internal" in types
    iface = np.asarray([t == "interface" for t in types])
    assert dists[iface].max() <= 5.5 + 1e-9
    assert dists[~iface].max() <= 3.0 + 1e-9
    # residue feature names preserved; atomtype is the atomic addition
    for feat in ("chain", "pos", "type", "charge", "polarity", "bsa",
                 "pssm", "cons", "ic", "atomtype"):
        assert feat in g.node_data, feat
        assert len(g.node_data[feat]) == len(g.nodes), feat
    at = np.asarray(g.node_data["atomtype"])
    assert at.shape[1] == 5 and np.all(at.sum(axis=1) == 1.0)
    # per-atom bsa: non-negative (unbound SASA >= complex SASA), and
    # some interface atoms genuinely buried
    bsa = np.asarray(g.node_data["bsa"]).ravel()
    assert bsa.min() >= -1e-6 and bsa.max() > 1.0


def test_atomic_graphhdf5_and_training(tmp_path):
    """GraphHDF5(graph_type='atomic') -> HDF5 -> NeuralNet training on
    the full TPU path (dense layout, device store, scanned epochs)."""
    from deeprank_gnn_tpu.featurize import GraphHDF5
    from deeprank_gnn_tpu.models import GINet
    from deeprank_gnn_tpu.train.neuralnet import NeuralNet

    out = str(tmp_path / "atomic.hdf5")
    GraphHDF5(
        pdb_path=PDB_DIR, ref_path=REF_DIR, pssm_path=PSSM_DIR,
        graph_type="atomic", outfile=out, nproc=1, use_tqdm=False,
    )
    with h5py.File(out) as f:
        mols = list(f.keys())
        assert len(mols) == 4
        m = f[mols[0]]
        assert m["nodes"].shape[0] > 150  # atomic resolution
        assert m["edge_index"].shape[0] > 0
        assert m["internal_edge_index"].shape[0] > 0
        assert "irmsd" in m["score"]

    nn = NeuralNet(
        out, GINet,
        node_feature=["type", "polarity", "atomtype", "bsa", "charge"],
        edge_feature=["dist"], target="irmsd", batch_size=2,
        percent=[0.75, 0.25], outdir=str(tmp_path / "run"),
        layout="dense", device_cache=True, scan_epochs=True,
    )
    nn.train(nepoch=2, validate=True)
    assert np.isfinite(nn.train_loss).all()
    assert np.isfinite(nn.valid_loss).all()


def test_unknown_graph_type_rejected(tmp_path):
    from deeprank_gnn_tpu.featurize import GraphHDF5

    with pytest.raises(ValueError, match="graph_type"):
        GraphHDF5(
            pdb_path=PDB_DIR, graph_type="nope",
            outfile=str(tmp_path / "x.hdf5"), nproc=1,
        )
