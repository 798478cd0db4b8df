"""Dense (per-graph MXU) layout must reproduce the sparse layout's
numerics exactly for all three model families, and train end to end."""

import numpy as np
import jax
import pytest

from deeprank_gnn_tpu.data import HDF5DataSet, collate
from deeprank_gnn_tpu.data.dense_batch import collate_dense
from deeprank_gnn_tpu.models import GINet, FoutNet, sGAT

NODE_FEATS = ["type", "polarity", "bsa", "depth", "hse", "ic", "pssm"]


@pytest.fixture(scope="module")
def graphs():
    ds = HDF5DataSet(
        database="/root/reference/tests/hdf5/1ATN_residue.hdf5",
        node_feature=NODE_FEATS,
        edge_feature=["dist"],
        target="irmsd",
        tqdm=False,
    )
    return [ds.get(i) for i in range(5)]


@pytest.mark.parametrize("model_cls", [GINet, FoutNet, sGAT])
def test_dense_matches_sparse(graphs, model_cls):
    model = model_cls(graphs[0].num_features, 1, 1)
    params = model.init(jax.random.PRNGKey(7))
    sparse_batch, _ = collate(graphs)
    dense_batch, _ = collate_dense(graphs)
    out_sparse = np.asarray(model.apply(params, sparse_batch))[: len(graphs)]
    out_dense = np.asarray(model.apply(params, dense_batch))[: len(graphs)]
    np.testing.assert_allclose(out_dense, out_sparse, rtol=2e-4, atol=1e-5)


def test_dense_gradients_match_sparse(graphs):
    import jax.numpy as jnp

    model = GINet(graphs[0].num_features, 1, 1)
    params = model.init(jax.random.PRNGKey(3))
    sparse_batch, _ = collate(graphs)
    dense_batch, _ = collate_dense(graphs)

    def loss(p, b):
        return jnp.sum(model.apply(p, b).reshape(-1)[: len(graphs)] ** 2)

    gs = jax.grad(loss)(params, sparse_batch)
    gd = jax.grad(loss)(params, dense_batch)
    for a, b in zip(jax.tree_util.tree_leaves(gs), jax.tree_util.tree_leaves(gd)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5
        )


def test_dense_training_end_to_end(tmp_path, fixture_hdf5):
    from deeprank_gnn_tpu import NeuralNet

    nn = NeuralNet(
        fixture_hdf5,
        GINet,
        node_feature=NODE_FEATS,
        target="irmsd",
        batch_size=10,
        percent=[1.0, 0.0],
        outdir=str(tmp_path),
        layout="dense",
    )
    nn.train(nepoch=2)
    assert np.isfinite(nn.train_loss).all()


def test_dense_attention_matches_sparse(graphs):
    """The 'fixed' attention mode (non-paper) in the dense layout must
    reproduce the sparse segment-softmax attention numerics."""
    model = GINet(graphs[0].num_features, 1, 1, attention=True)
    params = model.init(jax.random.PRNGKey(11))
    sparse_batch, _ = collate(graphs)
    dense_batch, _ = collate_dense(graphs)
    out_sparse = np.asarray(model.apply(params, sparse_batch))[: len(graphs)]
    out_dense = np.asarray(model.apply(params, dense_batch))[: len(graphs)]
    np.testing.assert_allclose(out_dense, out_sparse, rtol=2e-4, atol=1e-5)


def test_dense_attention_gradients_match_sparse(graphs):
    """Backward parity for the attention mode — pins the pad-edge
    softmax backward (inf*0 and eps^2-underflow NaN classes)."""
    import jax.numpy as jnp

    model = GINet(graphs[0].num_features, 1, 1, attention=True)
    params = model.init(jax.random.PRNGKey(0))
    sparse_batch, _ = collate(graphs)
    dense_batch, _ = collate_dense(graphs)

    def loss(p, b):
        return jnp.sum(model.apply(p, b).reshape(-1)[: len(graphs)] ** 2)

    gs = jax.grad(loss)(params, sparse_batch)
    gd = jax.grad(loss)(params, dense_batch)
    for a, b in zip(
        jax.tree_util.tree_leaves(gs), jax.tree_util.tree_leaves(gd)
    ):
        assert not np.isnan(np.asarray(b)).any()
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5
        )


def test_dense_mesh_matches_single_device(graphs):
    """Graph-axis sharding over an 8-device mesh must reproduce the
    single-device dense forward exactly (fully local per-graph compute,
    see `parallel.mesh.dense_batch_shardings`)."""
    from deeprank_gnn_tpu.parallel import make_mesh
    from deeprank_gnn_tpu.parallel.mesh import shard_dense_batch

    model = GINet(graphs[0].num_features, 1, 1)
    params = model.init(jax.random.PRNGKey(5))
    # pad graphs to 8 (device count) by repeating
    gs = (graphs * 2)[:8]
    dense_batch, _ = collate_dense(gs)
    single = np.asarray(jax.jit(model.apply)(params, dense_batch))

    mesh = make_mesh(jax.devices()[:8])
    sbatch = shard_dense_batch(dense_batch, mesh)
    sharded = np.asarray(jax.jit(model.apply)(params, sbatch))
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-7)


def test_dense_mesh_step_has_no_large_allgather(graphs):
    """Collective-structure evidence: the partitioned dense train step
    must contain NO all-gather/all-to-all of batch-sized arrays — the
    graph-axis layout is fully local; only (small) gradient/loss
    all-reduces are allowed."""
    import re

    import optax
    import jax.numpy as jnp

    from deeprank_gnn_tpu.parallel import make_mesh
    from deeprank_gnn_tpu.parallel.mesh import (
        dense_batch_shardings,
        shard_dense_batch,
    )
    from deeprank_gnn_tpu.train.losses import mse_loss

    model = GINet(graphs[0].num_features, 1, 1)
    params = model.init(jax.random.PRNGKey(5))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    gs = (graphs * 2)[:8]
    dense_batch, _ = collate_dense(gs)
    mesh = make_mesh(jax.devices()[:8])
    sbatch = shard_dense_batch(dense_batch, mesh)

    def step(params, opt_state, batch):
        def loss_fn(p):
            pred = model.apply(p, batch, training=False).reshape(-1)
            return mse_loss(pred, batch.y, batch.y_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    compiled = jax.jit(step).lower(params, opt_state, sbatch).compile()
    hlo = compiled.as_text()
    assert "all-reduce" in hlo  # the gradient psum must exist
    # any all-gather/all-to-all must be small (few KB — scalar/metric
    # plumbing), never a batch-sized node/edge tensor
    for m in re.finditer(r"(all-gather|all-to-all)[^=\n]*=\s*([a-z0-9]+)\[([0-9,]*)\]", hlo):
        shape = [int(s) for s in m.group(3).split(",") if s]
        elems = int(np.prod(shape)) if shape else 1
        assert elems <= 4096, f"large {m.group(1)} of shape {shape} in dense step"


def test_fused_impl_variants_agree():
    """All fused_gin_conv implementations (two-sided einsum, gather+
    one-hot scatter, Pallas-kernel math in interpret-free einsum form)
    compute the same segment_sum(xw[col], row)."""
    import jax.numpy as jnp

    from deeprank_gnn_tpu.ops.pallas import (
        _fused_gather_impl,
        _fused_ref,
        _fused_ref_exact,
    )

    rng = np.random.RandomState(0)
    g, s, f, e = 4, 24, 16, 40
    xw = jnp.asarray(rng.randn(g, s, f).astype(np.float32))
    row = jnp.asarray(rng.randint(0, s + 1, (g, e)).astype(np.int32))
    col = jnp.asarray(rng.randint(0, s + 1, (g, e)).astype(np.int32))
    ref = np.asarray(_fused_ref(xw, row, col))
    np.testing.assert_allclose(
        np.asarray(_fused_ref_exact(xw, row, col)), ref, rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(_fused_gather_impl(xw, row, col, True)), ref,
        rtol=1e-6, atol=1e-6,
    )
    # fast (single bf16 pass) variant: looser tolerance by design
    np.testing.assert_allclose(
        np.asarray(_fused_gather_impl(xw, row, col, False)), ref,
        rtol=2e-2, atol=2e-2,
    )


def test_member_max_pool_matches_broadcast():
    """member_max_pool (gather form) == slot_max_pool (broadcast form)
    in forward AND gradient, including exact ties (relu zeros), empty
    clusters, and padding rows/slots."""
    import jax
    import jax.numpy as jnp

    from deeprank_gnn_tpu.ops import dense as dops

    rng = np.random.RandomState(0)
    g, s, f, c, m = 3, 40, 8, 12, 16
    h = rng.randn(g, s, f).astype(np.float32)
    h[h < 0.3] = 0.0  # many exact ties (relu-like zeros)
    assign = rng.randint(0, c - 2, (g, s)).astype(np.int32)  # 2 empty slots
    assign[:, -5:] = c  # padding nodes -> sentinel
    mem = np.full((g, c, m), s, dtype=np.int32)
    for gi in range(g):
        for ci in range(c):
            members = np.flatnonzero(assign[gi] == ci)
            mem[gi, ci, : len(members)] = members
    h, assign, mem = jnp.asarray(h), jnp.asarray(assign), jnp.asarray(mem)

    out_m = dops.member_max_pool(h, mem, assign)
    out_b = dops.slot_max_pool(h, assign, c)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_b))

    cot = jnp.asarray(rng.randn(g, c, f).astype(np.float32))
    g_m = jax.grad(lambda x: (dops.member_max_pool(x, mem, assign) * cot).sum())(h)
    g_b = jax.grad(lambda x: (dops.slot_max_pool(x, assign, c) * cot).sum())(h)
    np.testing.assert_allclose(
        np.asarray(g_m), np.asarray(g_b), rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize("model_cls", [GINet, FoutNet, sGAT])
def test_cluster_sorted_collate_parity(graphs, model_cls):
    """cluster_sort=True (contiguous member runs): identical structure
    guarantees and output/grad parity with the unsorted collate."""
    import jax.numpy as jnp

    model = model_cls(graphs[0].num_features, 1, 1)
    params = model.init(jax.random.PRNGKey(11))
    plain, _ = collate_dense(graphs, precompute_ops=True, cluster_sort=False)
    srt, _ = collate_dense(graphs, precompute_ops=True, cluster_sort=True)

    ng = srt.x.shape[1]
    for gi in range(len(graphs)):
        a = np.asarray(srt.assign0[gi])
        valid = np.asarray(srt.node_mask[gi])
        # level-0 cluster ids nondecreasing over the valid nodes
        av = a[valid]
        assert (np.diff(av) >= 0).all()
        # member tables index contiguous runs (pad sentinel == ng)
        mem = np.asarray(srt.mem0_idx[gi])
        for c in range(mem.shape[0]):
            ms = mem[c][mem[c] < ng]
            if len(ms):
                assert (np.diff(ms) == 1).all(), (gi, c, ms)

    def loss(p, b):
        return jnp.sum(model.apply(p, b).reshape(-1)[: len(graphs)] ** 2)

    out_p = np.asarray(model.apply(params, plain))[: len(graphs)]
    out_s = np.asarray(model.apply(params, srt))[: len(graphs)]
    np.testing.assert_allclose(out_s, out_p, rtol=2e-4, atol=1e-5)
    gp = jax.grad(loss)(params, plain)
    gs = jax.grad(loss)(params, srt)
    for a, b in zip(
        jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gs)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5
        )


def test_tiled_pool_matches_slot_pool_fwd_and_grad():
    """`tiled_cluster_max_pool` (striped fm layout) == `slot_max_pool`
    (node-major broadcast) forward AND backward on random run-padded
    data — including even tie splits (duplicated values) and empty pad
    clusters."""
    import jax
    import jax.numpy as jnp

    from deeprank_gnn_tpu.ops import dense as dops

    rng = np.random.RandomState(5)
    G, C, F, R = 3, 7, 16, dops.TILE_R
    # random cluster sizes 1..12, run-padded layout
    lens = rng.randint(1, 13, size=(G, C))
    T = int((-(-lens // R) * R).sum(axis=1).max()) // R + 1  # + pad tile
    S = T * R
    h = np.zeros((G, F, R, T), np.float32)
    mask = np.zeros((G, R, T), bool)
    assign = np.full((G, S), C, np.int32)
    tile_mem = np.full((G, C, 2), T, np.int32)
    tile_assign = np.full((G, T), C, np.int32)
    hs_nm = np.zeros((G, S, F), np.float32)
    for g in range(G):
        off = 0
        for c in range(C):
            n = lens[g, c]
            pad = -(-n // R) * R
            t0, t1 = off // R, (off + pad) // R
            tile_mem[g, c, : t1 - t0] = np.arange(t0, t1)
            tile_assign[g, t0:t1] = c
            # values with deliberate ties (quantized)
            vals = np.round(rng.randn(n, F) * 2) / 2
            for j in range(n):
                s = off + j
                h[g, :, s % R, s // R] = vals[j]
                mask[g, s % R, s // R] = True
                assign[g, s] = c
                hs_nm[g, s] = vals[j]
            off += pad
    h = jnp.asarray(h)

    out_t = dops.tiled_cluster_max_pool(
        h, jnp.asarray(mask), jnp.asarray(tile_mem), jnp.asarray(tile_assign)
    )
    # node-major reference: mask pad slots to the sentinel cluster
    hs_ref = np.where(
        (assign < C)[..., None], hs_nm, 0.0
    ).astype(np.float32)
    a_ref = jnp.asarray(assign)
    out_s = dops.slot_max_pool(jnp.asarray(hs_nm), a_ref, C)
    np.testing.assert_array_equal(np.asarray(out_t), np.asarray(out_s))

    w = jnp.asarray(rng.randn(G, C, F).astype(np.float32))
    g_t = jax.grad(
        lambda x: (dops.tiled_cluster_max_pool(
            x, jnp.asarray(mask), jnp.asarray(tile_mem),
            jnp.asarray(tile_assign)) * w).sum()
    )(h)
    g_s = jax.grad(
        lambda x: (dops.slot_max_pool(x, a_ref, C) * w).sum()
    )(jnp.asarray(hs_nm))
    # map the node-major grad into the striped shape and compare
    g_s = np.asarray(g_s)
    g_s_fm = np.zeros_like(np.asarray(g_t))
    for g in range(G):
        for s in range(S):
            g_s_fm[g, :, s % R, s // R] = g_s[g, s]
    np.testing.assert_allclose(
        np.asarray(g_t), g_s_fm, atol=1e-6, rtol=1e-6
    )
