"""Device-resident graph store (`data/device_store.py`).

The dense layout's leading graph axis lets the whole dataset live on
device; batches are assembled by an on-device gather. These tests pin
the store path to the streaming collate path exactly (same batches,
same losses) — the reference has no device cache at all (it re-collates
on host every epoch, reference `NeuralNet.py:490-493`).
"""

import dataclasses
import os

import numpy as np
import pytest

from deeprank_gnn_tpu.data.batch import GraphLoader
from deeprank_gnn_tpu.data.dataset import HDF5DataSet


def _dataset(path):
    return HDF5DataSet(
        database=str(path),
        node_feature=["type", "polarity", "bsa"],
        edge_feature=["dist"],
        target="irmsd",
        clustering_method="mcl",
    )


def test_store_batches_equal_streaming(fixture_hdf5):
    ds = _dataset(fixture_hdf5)
    stream = GraphLoader(ds, batch_size=4, shuffle=False, layout="dense")
    cached = GraphLoader(
        ds, batch_size=4, shuffle=False, layout="dense", device_cache=True
    )
    sb, cb = list(stream), list(cached)
    assert len(sb) == len(cb) == 3
    for (b1, m1), (b2, m2) in zip(sb, cb):
        assert m1 == m2
        for f in dataclasses.fields(b1):
            v1, v2 = getattr(b1, f.name), getattr(b2, f.name)
            if v1 is None:
                # store batches additionally carry the precomputed
                # aggregation operators; the plain streaming collate
                # does not build them
                assert f.name in (
                    "agg_x", "deg0", "adj1",
                    "wagg_x", "ea_rowsum0", "wadj1", "ea_rowsum1",
                    "mem0_idx", "mem1_idx",
                    "agg_x_fm", "node_mask_fm",
                    "tile_mem0", "tile_assign0",
                )
                assert v2 is not None
                continue
            a1, a2 = np.asarray(v1), np.asarray(v2)
            assert a1.shape == a2.shape, f.name
            assert np.array_equal(a1, a2), f.name
    # padding stats populated from host-side per-slot counts
    assert cached.padding_stats["num_batches"] == 3
    assert 0 < cached.padding_stats["edge_efficiency"] <= 1


def test_streaming_precompute_matches_store(fixture_hdf5):
    """Streaming collation with precompute_ops=True must produce
    BIT-identical batches to the device store (the store is just the
    same collate uploaded once), including the operator fields."""
    ds = _dataset(fixture_hdf5)
    stream = GraphLoader(
        ds, batch_size=4, shuffle=False, layout="dense",
        precompute_ops=True,
    )
    cached = GraphLoader(
        ds, batch_size=4, shuffle=False, layout="dense", device_cache=True
    )
    for (b1, m1), (b2, m2) in zip(stream, cached):
        assert m1 == m2
        for f in dataclasses.fields(b1):
            v1, v2 = getattr(b1, f.name), getattr(b2, f.name)
            assert (v1 is None) == (v2 is None), f.name
            if v1 is None:
                continue
            assert np.array_equal(np.asarray(v1), np.asarray(v2)), f.name


def test_precomputed_operator_fields(fixture_hdf5):
    """The operator fields encode the aggregation exactly: agg_x is the
    segment-sum of x over edges, deg0 the in-degree, adj1 the pooled
    unique-pair adjacency."""
    ds = _dataset(fixture_hdf5)
    loader = GraphLoader(
        ds, batch_size=4, shuffle=False, layout="dense",
        precompute_ops=True,
    )
    (batch, _mols) = next(iter(loader))
    x = np.asarray(batch.x)
    row, col = np.asarray(batch.row), np.asarray(batch.col)
    ng = x.shape[1]
    for gi in range(2):
        ref = np.zeros_like(x[gi])
        deg = np.zeros(ng, np.float32)
        for r, c in zip(row[gi], col[gi]):
            if r < ng:
                ref[r] += x[gi, c] if c < ng else 0.0
                deg[r] += 1.0
        np.testing.assert_allclose(np.asarray(batch.agg_x)[gi], ref, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(batch.deg0)[gi], deg)
    adj1 = np.asarray(batch.adj1)
    pe_r, pe_c = np.asarray(batch.pe_row), np.asarray(batch.pe_col)
    c0g = adj1.shape[1]
    for gi in range(2):
        ref = np.zeros((c0g, c0g), np.float32)
        for r, c in zip(pe_r[gi], pe_c[gi]):
            if r < c0g and c < c0g:
                ref[r, c] = 1.0
        np.testing.assert_array_equal(adj1[gi], ref)


def test_adj_conv_matches_onehot_and_grads(fixture_hdf5):
    """`ops.dense.adj_conv` == the one-hot einsum contraction, forward
    and backward (the custom VJP is the exact adjoint)."""
    import jax
    import jax.numpy as jnp

    from deeprank_gnn_tpu.ops import dense as dops
    from deeprank_gnn_tpu.ops.pallas import fused_gin_conv

    ds = _dataset(fixture_hdf5)
    loader = GraphLoader(
        ds, batch_size=4, shuffle=False, layout="dense",
        precompute_ops=True,
    )
    batch, _ = next(iter(loader))
    rng = np.random.RandomState(0)
    # pe indices live on the pooled level: [G, Pg] indices into C0g slots
    hp = jnp.asarray(
        rng.randn(batch.adj1.shape[0], batch.adj1.shape[1], 32).astype(
            np.float32
        )
    )
    z_adj = dops.adj_conv(hp, batch.adj1, True)
    z_oh = fused_gin_conv(hp, batch.pe_row, batch.pe_col, True)
    np.testing.assert_allclose(
        np.asarray(z_adj), np.asarray(z_oh), rtol=1e-6, atol=1e-6
    )

    def f_adj(h):
        return (dops.adj_conv(h, batch.adj1, True) ** 2).sum()

    def f_oh(h):
        return (fused_gin_conv(h, batch.pe_row, batch.pe_col, True) ** 2).sum()

    g_adj = jax.grad(f_adj)(hp)
    g_oh = jax.grad(f_oh)(hp)
    np.testing.assert_allclose(
        np.asarray(g_adj), np.asarray(g_oh), rtol=1e-5, atol=1e-5
    )


def test_scan_step_dce_unused_segments(fixture_hdf5):
    """Byte-traffic evidence for the segmented packed store: the
    compiled operator-path GINet training scan must reference ONLY the
    'opcore' segment — the 'x' and 'edges' gathers are dead code the
    compiler removes, so the per-step batch gather moves a fraction of
    the row bytes."""
    import jax
    import jax.numpy as jnp
    import optax

    from deeprank_gnn_tpu.models import GINet
    from deeprank_gnn_tpu.train.losses import mse_loss
    from deeprank_gnn_tpu.train.scan import gather_store_batch

    ds = _dataset(fixture_hdf5)
    loader = GraphLoader(
        ds, batch_size=4, shuffle=False, layout="dense", device_cache=True
    )
    slots, _ = loader.device_epoch_plan()
    store = loader._store
    y_all = jnp.asarray(store.y_host.astype(np.float32))
    nf, _ = ds.feature_dims()
    model = GINet(nf, 1, 1)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def body(carry, idx):
        p, o, r = carry
        r, key = jax.random.split(r)
        b = gather_store_batch(store.store, y_all, idx)
        loss, g = jax.value_and_grad(
            lambda q: mse_loss(
                model.apply(q, b, training=True, rng=key).reshape(-1),
                b.y, b.y_mask,
            )
        )(p)
        u, o = opt.update(g, o, p)
        return (optax.apply_updates(p, u), o, r), loss

    def run(p, o, r):
        _, losses = jax.lax.scan(body, (p, o, r), jnp.asarray(slots))
        return losses

    hlo = (
        jax.jit(run)
        .lower(params, opt_state, jax.random.PRNGKey(1))
        .compile()
        .as_text()
    )
    # segments are now per-(use, dtype-class); group the shape strings
    # by use prefix — a use is "read" if ANY of its class matrices is
    # captured store matrices lower to executable PARAMETERS and the
    # dead ones are pruned from the parameter list — count parameters
    # per (dtype, shape). x:f32, aggx:f32 and opfm:f32 share one shape
    # (same element count), so the live-count must be exactly 1 (the
    # feature-major opfm matrix).
    import re
    from collections import Counter

    dtname = {"uint16": "u16", "float32": "f32", "int32": "s32",
              "bfloat16": "bf16"}
    cnt = Counter(
        re.findall(r"= (\S+\[\d+,\d+\])\S*\{[^}]*\} parameter", hlo)
    )

    def sh(name):
        m = store.store.segments[name]
        return f"{dtname[str(m.dtype)]}[{m.shape[0]},{m.shape[1]}]"

    assert cnt[sh("opcore:u16")] >= 1
    assert cnt[sh("opfm:u16")] >= 1
    assert sh("x:f32") == sh("aggx:f32") == sh("opfm:f32")
    assert cnt[sh("opfm:f32")] == 1  # opfm live; x and aggx pruned
    for dead in ("edges:u16", "edges:f32", "wop:f32", "nmask:u16"):
        assert cnt[sh(dead)] == 0, dead


@pytest.mark.parametrize("model_name", ["GINet", "FoutNet", "sGAT"])
def test_operator_path_matches_onehot(fixture_hdf5, model_name):
    """Every model's dense operator path (precomputed agg_x/adj1/
    weighted variants) must reproduce the one-hot contraction path to
    fp32 rounding, forward and gradient."""
    import jax

    from deeprank_gnn_tpu import models as M
    from deeprank_gnn_tpu.data.dense_batch import collate_dense

    ds = _dataset(fixture_hdf5)
    loader = GraphLoader(ds, batch_size=4, shuffle=False, layout="dense")
    graphs = [loader._get_sample(i) for i in range(4)]
    graphs = [g for g in graphs if g is not None]
    b0, _ = collate_dense(graphs)
    b1, _ = collate_dense(graphs, precompute_ops=True)
    model = getattr(M, model_name)(graphs[0].num_features, 1, 1)
    params = model.init(jax.random.PRNGKey(0))
    o0 = np.asarray(jax.jit(model.apply)(params, b0))
    o1 = np.asarray(jax.jit(model.apply)(params, b1))
    np.testing.assert_allclose(o0, o1, rtol=1e-5, atol=1e-6)

    def loss(p, b):
        return (model.apply(p, b) ** 2).sum()

    g0 = jax.grad(loss)(params, b0)
    g1 = jax.grad(loss)(params, b1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_store_reused_across_shuffled_epochs(fixture_hdf5):
    ds = _dataset(fixture_hdf5)
    loader = GraphLoader(
        ds, batch_size=4, shuffle=True, seed=1, layout="dense",
        device_cache=True,
    )
    e1 = [m for _, m in loader]
    store = loader._store
    e2 = [m for _, m in loader]
    assert loader._store is store  # one upload, many epochs
    assert sorted(sum(e1, [])) == sorted(sum(e2, []))
    assert e1 != e2  # reshuffled


def test_budget_fallback_streams(fixture_hdf5):
    ds = _dataset(fixture_hdf5)
    loader = GraphLoader(
        ds, batch_size=4, shuffle=False, layout="dense",
        device_cache=True, device_cache_bytes=1024,
    )
    batches = list(loader)
    assert loader._store is None and loader.device_cache is False
    assert len(batches) == 3  # streaming fallback still serves the epoch
    # the cache-defaulted operator fields are dropped on fallback (the
    # streamed epoch shouldn't pay their host work/transfer), so the
    # streamed batches carry no operators
    assert loader.precompute_ops is False
    assert batches[0][0].agg_x is None


def test_device_cache_requires_dense(fixture_hdf5):
    ds = _dataset(fixture_hdf5)
    with pytest.raises(ValueError):
        GraphLoader(ds, layout="sparse", device_cache=True)


def test_neuralnet_device_cache_matches_streaming(fixture_hdf5, tmp_path):
    from deeprank_gnn_tpu.models import GINet
    from deeprank_gnn_tpu.train.neuralnet import NeuralNet

    kw = dict(
        Net=GINet, target="irmsd", batch_size=4, percent=(0.8, 0.2),
        layout="dense", shuffle=True, seed=0,
    )
    nn1 = NeuralNet(str(fixture_hdf5), outdir=str(tmp_path / "a"), **kw)
    nn1.train(nepoch=2, validate=True)
    nn2 = NeuralNet(
        str(fixture_hdf5), outdir=str(tmp_path / "b"), device_cache=True, **kw
    )
    nn2.train(nepoch=2, validate=True)
    # the cached path trains on precomputed aggregation operators
    # (`ops.dense.adj_conv`): same math, different fp32 accumulation
    # order, so trajectories drift at rounding scale (~0.2% over two
    # epochs on this fixture). Bitwise equivalence of the two collations
    # is pinned separately in test_streaming_precompute_matches_store.
    assert np.allclose(nn1.train_loss, nn2.train_loss, rtol=3e-2)
    assert np.allclose(nn1.valid_loss, nn2.valid_loss, rtol=3e-2)


def test_device_cache_on_mesh_matches_streaming(fixture_hdf5, tmp_path):
    """Mesh runs replicate the store across chips: the batch gather is
    device-local and the step's input resharding slices locally — a
    multi-chip epoch with no host link."""
    import jax
    from deeprank_gnn_tpu.models import GINet
    from deeprank_gnn_tpu.parallel import make_mesh
    from deeprank_gnn_tpu.train.neuralnet import NeuralNet

    mesh = make_mesh(jax.devices())
    kw = dict(
        Net=GINet, target="irmsd", batch_size=8, percent=(0.8, 0.2),
        layout="dense", shuffle=True, seed=0, mesh=mesh,
    )
    nn1 = NeuralNet(str(fixture_hdf5), outdir=str(tmp_path / "a"), **kw)
    nn1.train(nepoch=2, validate=True)
    nn2 = NeuralNet(
        str(fixture_hdf5), outdir=str(tmp_path / "b"),
        device_cache=True, **kw,
    )
    nn2.train(nepoch=2, validate=True)
    # rounding-scale trajectory drift: see
    # test_neuralnet_device_cache_matches_streaming
    assert np.allclose(nn1.train_loss, nn2.train_loss, rtol=3e-2)
    assert np.allclose(nn1.valid_loss, nn2.valid_loss, rtol=3e-2)


def test_chunked_store_padding_matches_plain(fixture_hdf5):
    """Chunk slot counts round to batch_size multiples, so the chunked
    epoch's realized padding efficiency equals the plain store's (the
    0.78-vs-0.98 edge-fill regression of round 3: index-contiguous
    chunks left every chunk's tail batch mostly padding)."""
    ds = _dataset(fixture_hdf5)
    plain = GraphLoader(
        ds, batch_size=5, shuffle=False, layout="dense", device_cache=True
    )
    for _ in plain:
        pass
    # budget sized in per-slot units: room for ~6 slots per chunk, so
    # the un-rounded slot count (5 after the pad slot) is NOT the batch
    # multiple the rounding must produce
    from deeprank_gnn_tpu.data.device_store import estimate_store_bytes

    caps = dict(plain._dense_caps)
    caps.setdefault("pg", caps["eg"])
    nf, ef = ds.feature_dims()
    per_slot = estimate_store_bytes(
        1, num_features=nf, num_edge_features=ef,
        precompute_ops=plain.precompute_ops, **caps,
    ) // 2
    chunked = GraphLoader(
        ds, batch_size=5, shuffle=False, layout="dense",
        device_cache="chunked", device_cache_bytes=2 * 7 * per_slot,
    )
    for _ in chunked:
        pass
    assert chunked._chunk_store.num_chunks > 1
    assert (
        chunked.padding_stats["edge_efficiency"]
        == plain.padding_stats["edge_efficiency"]
    )
    assert (
        chunked.padding_stats["num_batches"]
        == plain.padding_stats["num_batches"]
    )


def test_chunked_store_serves_full_epoch(fixture_hdf5):
    """device_cache='chunked': a tiny byte budget forces multiple
    rotating chunks; an epoch must still deliver every molecule exactly
    once with correct targets."""
    ds = _dataset(fixture_hdf5)
    full = GraphLoader(ds, batch_size=4, shuffle=False, layout="dense")
    ref_mols, ref_y = [], []
    for b, m in full:
        ref_mols += m
        ref_y += list(np.asarray(b.y)[np.asarray(b.y_mask)])
    loader = GraphLoader(
        ds, batch_size=4, shuffle=False, layout="dense",
        device_cache="chunked", device_cache_bytes=2 * 300_000,
    )
    got_mols, got_y = [], []
    for b, m in loader:
        got_mols += m
        got_y += list(np.asarray(b.y)[np.asarray(b.y_mask)])
    assert loader._chunk_store is not None
    assert loader._chunk_store.num_chunks > 1
    assert got_mols == ref_mols  # same (unshuffled, chunk-consecutive)
    np.testing.assert_allclose(sorted(got_y), sorted(ref_y), rtol=1e-6)
    # batches carry the operator fields (chunk packs honor precompute)
    assert b.agg_x is not None


def test_chunked_store_shuffles_and_trains(fixture_hdf5, tmp_path):
    """Chunked-store training end-to-end through NeuralNet; shuffled
    epochs cover the dataset; whole-run scan ('full') composes only
    with the in-HBM store (eager error)."""
    from deeprank_gnn_tpu.models import GINet
    from deeprank_gnn_tpu.train.neuralnet import NeuralNet

    nn = NeuralNet(
        str(fixture_hdf5), Net=GINet, target="irmsd", batch_size=4,
        percent=(0.8, 0.2), layout="dense", shuffle=True, seed=0,
        device_cache="chunked", outdir=str(tmp_path),
    )
    nn.train_loader.device_cache_bytes = 2 * 300_000
    nn.train(nepoch=2, validate=True)
    assert np.isfinite(nn.train_loss).all()
    assert np.isfinite(nn.valid_loss).all()

    with pytest.raises(ValueError, match="scan_epochs='full'"):
        NeuralNet(
            str(fixture_hdf5), Net=GINet, target="irmsd", layout="dense",
            device_cache="chunked", scan_epochs="full",
            outdir=str(tmp_path / "x"),
        )


def test_chunked_scan_matches_chunked_loop(fixture_hdf5, tmp_path):
    """Chunked scanned epochs (one dispatch per chunk) reproduce the
    looped chunked path: same chunk/batch order (same loader RNG
    stream), same PRNG threading, same math."""
    from deeprank_gnn_tpu.models import GINet
    from deeprank_gnn_tpu.train.neuralnet import NeuralNet

    kw = dict(
        Net=GINet, target="irmsd", batch_size=4, percent=(0.8, 0.2),
        layout="dense", shuffle=True, seed=0, device_cache="chunked",
    )
    runs = {}
    for name, scan in (("loop", False), ("scan", True)):
        nn = NeuralNet(
            str(fixture_hdf5), outdir=str(tmp_path / name),
            scan_epochs=scan, **kw,
        )
        # force several chunks so rotation + the trailing short chunk
        # are exercised (halfword packing fits ~3 fixture graphs in
        # 75 kB)
        nn.train_loader.device_cache_bytes = 2 * 150_000
        if nn.valid_loader is not None:
            nn.valid_loader.device_cache_bytes = 2 * 150_000
        nn.train(nepoch=2, validate=True)
        if scan:
            assert nn.train_loader._chunk_store.num_chunks > 1
        runs[name] = (np.asarray(nn.train_loss), np.asarray(nn.valid_loss))
    np.testing.assert_allclose(
        runs["loop"][0], runs["scan"][0], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        runs["loop"][1], runs["scan"][1], rtol=1e-5, atol=1e-6
    )


# ---------------------------------------------------------------------------
# halfword packing (lossless u16 indices/masks/integer operators by
# default; opt-in bf16 for raw fp32 payloads)


def test_pack_halfword_kinds_and_bytes(fixture_hdf5):
    """The packed store stores indices/masks/integer-valued operators
    as one uint16 each (exact) and fp32 payloads as two — so the store
    (and therefore every per-step gather) is well under the 4-bytes-
    per-element bound; bf16 packing shrinks it further."""
    ds = _dataset(fixture_hdf5)
    loaders = {
        pack: GraphLoader(
            ds, batch_size=4, shuffle=False, layout="dense",
            device_cache=True, store_pack=pack,
        )
        for pack in ("lossless", "bf16")
    }
    stores = {}
    for pack, loader in loaders.items():
        next(iter(loader))
        stores[pack] = loader._store
    kinds = {
        name: kind
        for name, _seg, _a, _b, _shape, kind in stores["lossless"].store.layout
    }
    assert kinds["row"] == kinds["col"] == kinds["assign0"] == "u16i"
    assert kinds["node_mask"] == kinds["edge_mask"] == "u16b"
    # integer-valued float operators widen exactly from uint16
    assert kinds["deg0"] == "u16f" and kinds["adj1"] == "u16f"
    assert kinds["agg_x"] == "f32" and kinds["x"] == "f32"
    kinds16 = {
        name: kind
        for name, _seg, _a, _b, _shape, kind in stores["bf16"].store.layout
    }
    assert kinds16["x"] == kinds16["agg_x"] == kinds16["edge_attr"] == "bf16"
    assert kinds16["deg0"] == "u16f"  # still exact
    elems = 0
    import dataclasses as _dc

    from deeprank_gnn_tpu.data.device_store import gather_packed
    import jax.numpy as jnp

    full = gather_packed(
        stores["lossless"].store,
        jnp.arange(stores["lossless"].num_graphs + 1),
    )
    for f in _dc.fields(full):
        v = getattr(full, f.name)
        if v is not None:
            elems += v.size
    assert stores["lossless"].nbytes < 0.75 * elems * 4
    assert stores["bf16"].nbytes < stores["lossless"].nbytes


def test_store_pack_bf16_close_to_streaming(fixture_hdf5):
    """bf16-packed store batches: structural fields exact, fp32
    payloads within bf16 rounding of the streaming collation."""
    ds = _dataset(fixture_hdf5)
    stream = GraphLoader(
        ds, batch_size=4, shuffle=False, layout="dense",
        precompute_ops=True,
    )
    cached = GraphLoader(
        ds, batch_size=4, shuffle=False, layout="dense",
        device_cache=True, store_pack="bf16",
    )
    lossy = {"x", "edge_attr", "agg_x", "agg_x_fm", "wagg_x", "wadj1",
             "ea_rowsum0", "ea_rowsum1"}
    for (b1, m1), (b2, m2) in zip(stream, cached):
        assert m1 == m2
        for f in dataclasses.fields(b1):
            v1, v2 = getattr(b1, f.name), getattr(b2, f.name)
            assert (v1 is None) == (v2 is None), f.name
            if v1 is None:
                continue
            a1, a2 = np.asarray(v1), np.asarray(v2)
            if f.name in lossy:
                # bf16 has an 8-bit mantissa: relative error <= 2^-8
                np.testing.assert_allclose(
                    a1, a2, rtol=2 ** -8, atol=1e-6, err_msg=f.name
                )
            else:
                assert np.array_equal(a1, a2), f.name


def test_pack_kinds_are_static_per_capacity(fixture_hdf5):
    """Field encodings depend only on the dense capacities, never on
    the data: capacities beyond uint16 widen to exact 32-bit kinds,
    equal-capacity batches with different data share one layout (so
    every chunk of a ChunkedGraphStore reuses one compiled epoch
    program), and data violating the structural bound raises instead of
    silently truncating."""
    from deeprank_gnn_tpu.data.dense_batch import collate_dense
    from deeprank_gnn_tpu.data.device_store import (
        PackedStore,
        _pack_host,
        gather_packed,
        static_field_kinds,
    )
    import jax.numpy as jnp

    ds = _dataset(fixture_hdf5)
    loader = GraphLoader(ds, batch_size=4, shuffle=False, layout="dense")
    graphs = [g for g in (loader._get_sample(i) for i in range(4)) if g]

    # capacity-driven widening: ng beyond uint16 -> row/col pack i32,
    # eg beyond uint16 -> deg0 packs f32 (in-degree bound no longer
    # fits u16); exact round trip either way
    wide = static_field_kinds(
        ng=70_000, eg=70_000, pg=128, c0g=48, c1g=16
    )
    assert wide["row"] == "i32" and wide["col"] == "i32"
    assert wide["deg0"] == "f32"
    assert wide["assign0"] == "u16i"  # bound c0g still fits

    # same capacities, different data -> identical layouts
    ball, _ = collate_dense(graphs, precompute_ops=True)
    caps = dict(
        ng=ball.x.shape[1], eg=ball.row.shape[1], pg=ball.pe_row.shape[1],
        c0g=ball.pool0_mask.shape[1], c1g=ball.pool1_mask.shape[1],
        m0g=ball.mem0_idx.shape[2], m1g=ball.mem1_idx.shape[2],
    )
    b1, _ = collate_dense(graphs[:2], precompute_ops=True, **caps)
    b2, _ = collate_dense(graphs[2:4], precompute_ops=True, **caps)
    segs1, layout1 = _pack_host(b1, "lossless")
    _segs2, layout2 = _pack_host(b2, "lossless")
    assert layout1 == layout2

    # round trip stays exact
    store = PackedStore(
        segments={s: jnp.asarray(m) for s, m in segs1.items()},
        layout=layout1,
    )
    out = gather_packed(store, jnp.arange(b1.num_graphs))
    assert np.array_equal(np.asarray(out.row), np.asarray(b1.row))
    assert np.array_equal(np.asarray(out.deg0), np.asarray(b1.deg0))

    # structural-bound violation is loud, not a silent truncation
    big = np.asarray(b1.row).copy()
    big[:, 0] = 70_000
    with pytest.raises(ValueError, match="static u16"):
        _pack_host(dataclasses.replace(b1, row=big), "lossless")


def test_neuralnet_bf16_pack_trains_close(fixture_hdf5, tmp_path):
    """End-to-end scanned training on a bf16-packed store tracks the
    lossless run (the only divergence is bf16 rounding of the raw
    feature payloads)."""
    from deeprank_gnn_tpu.models import GINet
    from deeprank_gnn_tpu.train.neuralnet import NeuralNet

    kw = dict(
        Net=GINet, target="irmsd", batch_size=4, percent=(0.8, 0.2),
        layout="dense", shuffle=True, seed=0, device_cache=True,
        scan_epochs=True,
    )
    nn1 = NeuralNet(str(fixture_hdf5), outdir=str(tmp_path / "a"), **kw)
    nn1.train(nepoch=2, validate=True)
    nn2 = NeuralNet(
        str(fixture_hdf5), outdir=str(tmp_path / "b"),
        store_pack="bf16", **kw,
    )
    nn2.train(nepoch=2, validate=True)
    assert np.isfinite(nn2.train_loss).all()
    assert np.allclose(nn1.train_loss, nn2.train_loss, rtol=5e-2)
    assert np.allclose(nn1.valid_loss, nn2.valid_loss, rtol=5e-2)
