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
    """Window selection: tightest ALIGN-multiple (the fp32 sublane
    tile, 8) satisfying the block contract; None for unsorted; minimal
    for empty/degenerate rows."""
    import numpy as np

    from deeprank_gnn_tpu.ops.pallas.segment import (
        ALIGN,
        BLOCK_EDGES,
        required_window,
        sorted_window_ok,
    )

    # empty -> minimal window
    assert required_window(np.array([], dtype=np.int64), 10) == ALIGN
    # unsorted -> None (kernel ineligible)
    assert required_window(np.array([3, 1, 2]), 10) is None
    # dense repeats: one block spans 8 rows -> exactly one sublane tile
    rows = np.repeat(np.arange(8), BLOCK_EDGES // 8)
    assert required_window(rows, 8) == 8
    # strictly increasing rows starting aligned: span == BLOCK
    rows = np.arange(BLOCK_EDGES * 3)
    assert required_window(rows, BLOCK_EDGES * 3) == BLOCK_EDGES
    # misaligned starts additionally pay the sublane-alignment slack
    rows = np.arange(1, BLOCK_EDGES * 3 + 1)
    w = required_window(rows, BLOCK_EDGES * 3 + 1)
    assert w == BLOCK_EDGES + ALIGN
    assert sorted_window_ok(rows, BLOCK_EDGES * 3 + 1, window=w)
    assert not sorted_window_ok(rows, BLOCK_EDGES * 3 + 1, window=w - ALIGN)
    # rows jumping beyond the default window within a block
    rows = np.sort(np.array([0, 1, 2, 1500] + [1500] * (BLOCK_EDGES - 4)))
    assert required_window(rows, 2000) == 1504


def test_sorted_scatter_gather_interpret():
    """Fused scatter + sorted gather-back (VERDICT r4 item 1): both
    outputs match the unfused composition bitwise, padding rows gather
    0, and the custom VJP matches autodiff of the composition."""
    import jax
    import jax.numpy as jnp

    from deeprank_gnn_tpu.ops.pallas.segment import (
        required_window,
        sorted_scatter_gather,
        sorted_segment_sum,
    )

    rng = np.random.RandomState(3)
    n, e, f = 700, 2000, 8
    rows_np = np.sort(rng.randint(0, n, e)).astype(np.int32)
    # trailing padding rows (== n)
    rows_np[-37:] = n
    rows = jnp.asarray(rows_np)
    data = jnp.asarray(rng.randn(e, f).astype(np.float32))
    w = required_window(rows_np, n)

    out, d2 = sorted_scatter_gather(data, rows, n, True, w)
    ref_out = sorted_segment_sum(data, rows, n, True, w)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))
    ref_d2 = np.asarray(ref_out)[np.minimum(rows_np, n - 1)]
    ref_d2[rows_np >= n] = 0.0
    np.testing.assert_array_equal(np.asarray(d2), ref_d2)

    # VJP vs autodiff of the unfused composition
    def fused(d):
        o, g = sorted_scatter_gather(d, rows, n, True, w)
        return (o * w1).sum() + (g * w2).sum()

    def unfused(d):
        o = sorted_segment_sum(d, rows, n, True, w)
        g = jnp.take(o, jnp.minimum(rows, n - 1), axis=0)
        g = jnp.where((rows < n)[:, None], g, 0.0)
        return (o * w1).sum() + (g * w2).sum()

    w1 = jnp.asarray(rng.randn(n, f).astype(np.float32))
    w2 = jnp.asarray(rng.randn(e, f).astype(np.float32))
    g_f = jax.grad(fused)(data)
    g_u = jax.grad(unfused)(data)
    np.testing.assert_allclose(
        np.asarray(g_f), np.asarray(g_u), atol=1e-5, rtol=1e-5
    )


def test_sorted_scatter_gather_multiblock_boundary():
    """Rows spanning a block boundary: the gather phase must see the
    FINAL accumulated value (contributions from both adjacent blocks)."""
    import jax.numpy as jnp

    from deeprank_gnn_tpu.ops.pallas.segment import (
        BLOCK_EDGES,
        required_window,
        sorted_scatter_gather,
    )

    # one segment id repeated across the block boundary
    e = 2 * BLOCK_EDGES
    n = 600
    rows_np = np.full(e, 511, dtype=np.int32)
    rows_np[: BLOCK_EDGES // 2] = 3
    rows_np[-BLOCK_EDGES // 2 :] = 598
    data = jnp.ones((e, 4), dtype=jnp.float32)
    w = required_window(rows_np, n)
    out, d2 = sorted_scatter_gather(
        data, jnp.asarray(rows_np), n, True, w
    )
    out = np.asarray(out)
    assert out[3, 0] == BLOCK_EDGES // 2
    assert out[511, 0] == BLOCK_EDGES  # halves from both blocks
    assert out[598, 0] == BLOCK_EDGES // 2
    d2 = np.asarray(d2)
    np.testing.assert_array_equal(d2, out[rows_np])
