"""Pallas sorted-scatter kernel semantics (interpret mode on CPU).

The real kernel runs on TPU only; `interpret=True` executes the same
kernel logic on CPU so the window construction, padding-drop semantics
and custom-vjp are pinned by the suite. The TPU bench compares the
compiled kernel against XLA's scatter on hardware (bench.py)."""

import dataclasses

import numpy as np
import pytest


def test_sorted_window_contract_on_fixture(fixture_hdf5):
    """Real collated batches satisfy the kernel contract and are
    flagged edges_sorted=True."""
    from deeprank_gnn_tpu.data.batch import collate
    from deeprank_gnn_tpu.data.dataset import HDF5DataSet

    ds = HDF5DataSet(
        database=fixture_hdf5,
        node_feature=["type", "polarity", "bsa"],
        edge_feature=["dist"],
        target="irmsd",
        clustering_method="mcl",
    )
    batch, _ = collate([ds.get(i) for i in range(len(ds))])
    assert batch.edges_sorted
    rows = np.asarray(batch.edge_index[0])
    assert (np.diff(rows) >= 0).all()
    # pooled edges too
    pe_rows = np.asarray(batch.pe_index[0])
    assert (np.diff(pe_rows) >= 0).all()


def test_sorted_segment_sum_interpret_matches_xla(fixture_hdf5):
    import jax.numpy as jnp

    from deeprank_gnn_tpu.data.batch import collate
    from deeprank_gnn_tpu.data.dataset import HDF5DataSet
    from deeprank_gnn_tpu.ops.pallas.segment import sorted_segment_sum
    from deeprank_gnn_tpu.ops.segment import segment_sum

    ds = HDF5DataSet(
        database=fixture_hdf5,
        node_feature=["type", "polarity", "bsa", "pssm"],
        edge_feature=["dist"],
        target="irmsd",
        clustering_method="mcl",
    )
    batch, _ = collate([ds.get(i) for i in range(len(ds))])
    rng = np.random.RandomState(0)
    n = batch.num_nodes
    rows = batch.edge_index[0]
    msgs = jnp.asarray(rng.randn(rows.shape[0], 32).astype(np.float32))
    ref = segment_sum(msgs, rows, n)
    out = sorted_segment_sum(msgs, rows, n, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    # pooled-edge rows (conv2's scatter) as well
    c0 = batch.num_clusters0
    pe_rows = batch.pe_index[0]
    msgs2 = jnp.asarray(rng.randn(pe_rows.shape[0], 16).astype(np.float32))
    ref2 = segment_sum(msgs2, pe_rows, c0)
    out2 = sorted_segment_sum(msgs2, pe_rows, c0, True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=1e-4)


def test_sorted_segment_sum_grad():
    import jax
    import jax.numpy as jnp

    from deeprank_gnn_tpu.ops.pallas.segment import sorted_segment_sum
    from deeprank_gnn_tpu.ops.segment import segment_sum

    rng = np.random.RandomState(1)
    n, e, f = 300, 1500, 16
    rows = np.sort(rng.randint(0, n, e)).astype(np.int32)
    # make coverage gap-free (kernel contract): ensure every id appears
    rows[:n] = np.arange(n)
    rows = np.sort(rows)
    data = jnp.asarray(rng.randn(e, f).astype(np.float32))
    w = jnp.asarray(rng.randn(n, f).astype(np.float32))

    def loss_pallas(d):
        return (sorted_segment_sum(d, jnp.asarray(rows), n, True) * w).sum()

    def loss_xla(d):
        return (segment_sum(d, jnp.asarray(rows), n) * w).sum()

    gp = jax.grad(loss_pallas)(data)
    gx = jax.grad(loss_xla)(data)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-4)


def test_window_contract_violation_detected():
    from deeprank_gnn_tpu.ops.pallas.segment import (
        BLOCK_EDGES,
        WINDOW,
        sorted_window_ok,
    )

    # a giant gap inside one block breaks the window contract
    rows = np.concatenate(
        [np.zeros(10, np.int32), np.full(10, 10 * WINDOW, np.int32)]
    )
    assert not sorted_window_ok(rows, 10 * WINDOW + 1)
    # unsorted rows are rejected
    assert not sorted_window_ok(np.array([5, 3, 7]), 10)
    # dense coverage passes
    ok = np.repeat(np.arange(2 * BLOCK_EDGES), 2)
    assert sorted_window_ok(ok, 2 * BLOCK_EDGES)


def test_model_forward_identical_sorted_flag(fixture_hdf5):
    """edges_sorted=True vs False produce identical results on CPU
    (same XLA fallback math; the flag only switches kernels on TPU)."""
    import jax

    from deeprank_gnn_tpu.data.batch import collate
    from deeprank_gnn_tpu.data.dataset import HDF5DataSet
    from deeprank_gnn_tpu.models import GINet

    ds = HDF5DataSet(
        database=fixture_hdf5,
        node_feature=["type", "polarity", "bsa"],
        edge_feature=["dist"],
        target="irmsd",
        clustering_method="mcl",
    )
    batch, _ = collate([ds.get(i) for i in range(4)])
    net = GINet(input_shape=ds.get(0).num_features)
    params = net.init(jax.random.PRNGKey(0))
    out_sorted = np.asarray(net.apply(params, batch))
    out_flat = np.asarray(
        net.apply(params, dataclasses.replace(batch, edges_sorted=False))
    )
    np.testing.assert_allclose(out_sorted, out_flat, atol=1e-6)


def test_required_window_edges():
    """Window selection: tightest 128-multiple satisfying the block
    contract; None for unsorted; minimal for empty/degenerate rows."""
    import numpy as np

    from deeprank_gnn_tpu.ops.pallas.segment import (
        BLOCK_EDGES,
        required_window,
        sorted_window_ok,
    )

    # empty -> minimal window
    assert required_window(np.array([], dtype=np.int64), 10) == 128
    # unsorted -> None (kernel ineligible)
    assert required_window(np.array([3, 1, 2]), 10) is None
    # dense repeats: one block spans few rows -> 128
    rows = np.repeat(np.arange(8), BLOCK_EDGES // 8)
    assert required_window(rows, 8) == 128
    # strictly increasing rows starting 128-aligned: span == BLOCK
    rows = np.arange(BLOCK_EDGES * 3)
    assert required_window(rows, BLOCK_EDGES * 3) == BLOCK_EDGES
    # misaligned starts additionally pay the 128-alignment slack
    rows = np.arange(1, BLOCK_EDGES * 3 + 1)
    w = required_window(rows, BLOCK_EDGES * 3 + 1)
    assert w == BLOCK_EDGES + 128
    assert sorted_window_ok(rows, BLOCK_EDGES * 3 + 1, window=w)
    assert not sorted_window_ok(rows, BLOCK_EDGES * 3 + 1, window=w - 128)
    # rows jumping beyond the default window within a block
    rows = np.sort(np.array([0, 1, 2, 1500] + [1500] * (BLOCK_EDGES - 4)))
    assert required_window(rows, 2000) == 1536
