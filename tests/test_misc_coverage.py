"""Edge-path coverage: segment_min, coalesce with self-loops kept,
loader drop_last, dataset transform hook, prefetch error propagation."""

import numpy as np
import jax.numpy as jnp
import pytest

from deeprank_gnn_tpu.data import HDF5DataSet, GraphLoader
from deeprank_gnn_tpu.ops import coalesce_edges
from deeprank_gnn_tpu.ops.segment import segment_min


def test_segment_min():
    data = jnp.array([[3.0], [1.0], [5.0], [2.0]])
    ids = jnp.array([0, 0, 1, 3])  # segment 2 empty
    out = np.asarray(segment_min(data, ids, 4))
    np.testing.assert_allclose(out[:, 0], [1.0, 5.0, 0.0, 2.0])


def test_coalesce_keep_self_loops():
    edge_index = jnp.array([[0, 1, 1], [0, 1, 0]], dtype=jnp.int32)
    attr = jnp.array([[1.0], [2.0], [3.0]])
    mask = jnp.array([True, True, True])
    idx, a, m = coalesce_edges(
        edge_index, attr, mask, 3, remove_self_loops=False
    )
    assert int(m.sum()) == 3  # (0,0), (1,0), (1,1) all kept
    np.testing.assert_array_equal(
        np.asarray(idx[:, :3]), [[0, 1, 1], [0, 0, 1]]
    )


def test_loader_drop_last(fixture_hdf5):
    ds = HDF5DataSet(
        database=fixture_hdf5, node_feature=["type"], target="irmsd", tqdm=False
    )
    loader = GraphLoader(ds, batch_size=3, drop_last=True)
    batches = list(loader)
    assert len(batches) == 3  # 10 graphs -> 3 full batches of 3
    loader2 = GraphLoader(ds, batch_size=3, drop_last=False)
    assert len(list(loader2)) == 4


def test_dataset_transform_hook(fixture_hdf5):
    calls = []

    def transform(sample):
        calls.append(sample.mol)
        sample.x = sample.x * 2
        return sample

    ds = HDF5DataSet(
        database=fixture_hdf5,
        node_feature=["type"],
        target="irmsd",
        transform=transform,
        tqdm=False,
    )
    s = ds.get(0)
    assert calls and s is not None


def test_prefetch_propagates_errors():
    from deeprank_gnn_tpu.data.prefetch import prefetch

    def bad_iter():
        yield np.zeros(3), ["a"]
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        for _ in prefetch(bad_iter()):
            pass


def test_loader_skips_unloadable(fixture_hdf5):
    """A graph deleted behind the loader's back is skipped, not fatal."""
    import h5py

    ds = HDF5DataSet(
        database=fixture_hdf5, node_feature=["type"], target="irmsd", tqdm=False
    )
    with h5py.File(fixture_hdf5, "a") as f:
        del f["1ATN_5w"]
    loader = GraphLoader(ds, batch_size=10)
    (batch, mols), = list(loader)
    assert len(mols) == 9 and "1ATN_5w" not in mols
