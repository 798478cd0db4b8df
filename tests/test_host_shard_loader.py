"""GraphLoader multi-host ingest contract: with ``host_batch_slice``
set, a process reads ONLY the sample payloads inside its slice of each
global batch (the reference-shaped alternative — every host
materializes the full batch, `parallel/mesh.py` round-1 — does not
scale ingest with host count)."""

import numpy as np
import pytest

from deeprank_gnn_tpu.data.batch import GraphLoader
from deeprank_gnn_tpu.data.dataset import HDF5DataSet


def _dataset(fixture_hdf5):
    return HDF5DataSet(
        root="./",
        database=fixture_hdf5,
        node_feature=["type", "polarity", "bsa"],
        edge_feature=["dist"],
        target="irmsd",
        clustering_method="mcl",
        tqdm=False,
    )


def test_host_slice_loads_only_local_payloads(fixture_hdf5):
    ds = _dataset(fixture_hdf5)
    loaded = []
    orig_get = ds.get

    def spy_get(i):
        loaded.append(i)
        return orig_get(i)

    ds.get = spy_get
    # global batches of 4; this "host" owns positions 2:4 of each
    loader = GraphLoader(
        ds, batch_size=4, layout="dense", host_batch_slice=slice(2, 4)
    )
    batches = list(loader)
    # 10 fixture graphs -> 3 global batches; local shard = 2 graphs each
    assert len(batches) == 3
    for batch, mols in batches:
        assert batch.x.shape[0] == 2
        assert len(mols) <= 2
    # positions 0,1 of every global batch were never materialized
    order = np.arange(len(ds))
    expected = [
        int(order[start : start + 4][2:4][k])
        for start in range(0, len(order), 4)
        for k in range(len(order[start : start + 4][2:4]))
    ]
    assert sorted(loaded) == sorted(expected)
    assert len(loaded) < len(ds)


def test_host_slice_matches_full_batch_content(fixture_hdf5):
    """Concatenating every host's local dense batches reproduces the
    full-batch collation exactly (same graphs, same padding slots)."""
    ds = _dataset(fixture_hdf5)
    full = list(GraphLoader(ds, batch_size=4, layout="dense"))
    lo = list(
        GraphLoader(
            ds, batch_size=4, layout="dense", host_batch_slice=slice(0, 2)
        )
    )
    hi = list(
        GraphLoader(
            ds, batch_size=4, layout="dense", host_batch_slice=slice(2, 4)
        )
    )
    assert len(full) == len(lo) == len(hi)
    for (fb, fm), (lb, lm), (hb, hm) in zip(full, lo, hi):
        assert lm + hm == fm
        np.testing.assert_array_equal(
            np.concatenate([lb.x, hb.x], axis=0), fb.x
        )
        np.testing.assert_array_equal(
            np.concatenate([lb.y, hb.y]), fb.y
        )
        np.testing.assert_array_equal(
            np.concatenate([lb.edge_mask, hb.edge_mask], axis=0),
            fb.edge_mask,
        )


def test_host_slice_requires_dense():
    with pytest.raises(ValueError):
        GraphLoader(
            dataset=[], batch_size=4, layout="sparse",
            host_batch_slice=slice(0, 2),
        )
