"""Dataset + batching tests over the committed 1ATN fixture
(reference `tests/test_dataset.py` coverage, plus batcher invariants
the reference cannot express)."""

import numpy as np
import pytest

from deeprank_gnn_tpu.data import HDF5DataSet, DivideDataSet, collate, GraphLoader

NODE_FEATS = ["type", "polarity", "bsa", "depth", "hse", "ic", "pssm"]


def make_ds(path, **kw):
    kw.setdefault("node_feature", NODE_FEATS)
    kw.setdefault("edge_feature", ["dist"])
    kw.setdefault("target", "irmsd")
    kw.setdefault("tqdm", False)
    return HDF5DataSet(database=path, **kw)


def test_dataset_load(fixture_hdf5):
    ds = make_ds(fixture_hdf5)
    assert len(ds) == 10
    s = ds.get(0)
    assert s.num_nodes == 108
    # type1 + polarity1 + bsa1 + depth1 + hse3 + ic1 + pssm20 = 28
    assert s.num_features == 28
    # direction-doubled edges
    assert s.edge_index.shape == (2, 2 * 252)
    assert s.internal_edge_index.shape == (2, 2 * 183)
    # edge transform maps distances into (0, 2]
    assert s.edge_attr.min() > 0.0 and s.edge_attr.max() <= 2.0
    assert s.cluster0.shape == (108,)
    assert s.y is not None


def test_dataset_all_features(fixture_hdf5):
    ds = make_ds(fixture_hdf5, node_feature="all")
    s = ds.get(0)
    # all 11 stored features, total width 1+1+1+1+3+1+1+3+20+1 + bsa(1)=34
    assert s.num_features == 34


def test_dict_filter(fixture_hdf5):
    ds_all = make_ds(fixture_hdf5)
    ds = make_ds(fixture_hdf5, dict_filter={"irmsd": "<15.3"})
    assert 0 < len(ds) < len(ds_all)
    for fname, mol in ds.index_complexes:
        import h5py

        with h5py.File(fname, "r") as f:
            assert f[mol]["score/irmsd"][()] < 15.3


def test_divide_dataset(fixture_hdf5):
    ds = make_ds(fixture_hdf5)
    d1, d2 = DivideDataSet(ds, percent=[0.8, 0.2])
    assert len(d1) == 8 and len(d2) == 2


def test_missing_feature_raises(fixture_hdf5):
    with pytest.raises(ValueError):
        make_ds(fixture_hdf5, node_feature=["nonexistent_feature"])


def test_collate_invariants(fixture_hdf5):
    ds = make_ds(fixture_hdf5)
    graphs = [ds.get(i) for i in range(4)]
    batch, mols = collate(graphs)
    assert len(mols) == 4
    n_real = sum(g.num_nodes for g in graphs)
    assert int(batch.node_mask.sum()) == n_real
    assert batch.num_nodes % 128 == 0
    # every real node belongs to a valid graph and cluster
    ng = np.asarray(batch.node_graph)[np.asarray(batch.node_mask)]
    assert ng.max() < 4
    a0 = np.asarray(batch.assign0)[np.asarray(batch.node_mask)]
    assert a0.max() < int(np.asarray(batch.pool0_mask).sum())
    # pooled edges: every valid edge maps into a valid pooled slot or dump
    e2p = np.asarray(batch.edge_to_pe)
    em = np.asarray(batch.edge_mask)
    pe_count = int(np.asarray(batch.pe_mask).sum())
    mapped = e2p[em]
    assert ((mapped < pe_count) | (mapped == e2p.shape[0])).all()
    # pooled edge endpoints differ (no self loops)
    pe = np.asarray(batch.pe_index)[:, np.asarray(batch.pe_mask)]
    assert (pe[0] != pe[1]).all()
    # targets
    assert int(np.asarray(batch.y_mask).sum()) == 4


def test_loader_shapes_stable(fixture_hdf5):
    ds = make_ds(fixture_hdf5)
    loader = GraphLoader(ds, batch_size=5, shuffle=True)
    shapes = set()
    for batch, mols in loader:
        shapes.add((batch.num_nodes, batch.edge_mask.shape[0], batch.num_graphs))
    assert len(shapes) == 1  # homogeneous graphs -> one bucket
