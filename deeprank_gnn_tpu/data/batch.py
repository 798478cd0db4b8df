"""Padded, bucketed graph batching with host-precomputed pooling plans.

This replaces torch-geometric's dynamic `Batch.from_data_list` collation
(used at reference `NeuralNet.py:153-175`) with a TPU-first design:

- **Static shapes.** Nodes/edges/clusters are padded to bucket sizes so
  every batch of a bucket reuses one XLA executable.
- **Host does the integers, device does the math.** Graph offsets,
  cluster renumbering (the reference's `get_preloaded_cluster` +
  `consecutive_cluster`, `community_pooling.py:25-30,197`), and the
  pooled-edge coalescing pattern (PyG `pool_edge` -> torch-sparse
  `coalesce`, `community_pooling.py:204-210`) are all integer-only and
  data-independent of the learned features, so the collator precomputes
  them once per batch. The device then runs only gathers, GEMMs and
  segment reductions — no sorting/unique on the TPU.

Padding conventions (consumed by :mod:`deeprank_gnn_tpu.ops.segment`):
- padded edge endpoints point at row `num_nodes_padded` (clamped gather,
  masked out of reductions via the dump-row),
- padded segment ids equal the segment count (routed to the dump row),
- boolean masks accompany every padded axis.

Internal edges ride along in the batch with their own pooled-edge plan
(`iedge_to_pie` / `pie_index`). Note the shipped reference models never
consume them in forward passes (quirk Q2, reference
`ginet.py:101,118-130`) — internal edges shape those models only
through offline pre-clustering — but the reference *documentation*
describes an intra-protein second tower
(`docs/tutorial.advanced.rst:127-138`), available here as
`GINet(internal_tower=True)`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np
import jax

from deeprank_gnn_tpu.data.dataset import GraphSample, HDF5DataSet


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GraphBatch:
    """A padded batch of residue interface graphs (all arrays padded)."""

    # level-0 graph
    x: jax.Array  # [N, F] float32 node features
    pos: jax.Array  # [N, 3] float32
    node_graph: jax.Array  # [N] int32 graph id, pad -> G
    node_mask: jax.Array  # [N] bool
    edge_index: jax.Array  # [2, E] int32, pad endpoints -> N
    edge_attr: jax.Array  # [E, Fe] float32
    edge_mask: jax.Array  # [E] bool
    iedge_index: jax.Array  # [2, Ei] int32 internal edges
    iedge_attr: jax.Array  # [Ei, Fe]
    iedge_mask: jax.Array  # [Ei] bool

    # level-0 -> level-1 community pooling plan
    assign0: jax.Array  # [N] int32 cluster id in [0, C0), pad -> C0
    pool0_graph: jax.Array  # [C0] int32 graph id of pooled node
    pool0_mask: jax.Array  # [C0] bool
    edge_to_pe: jax.Array  # [E] int32 slot of pooled edge, pad/selfloop -> E
    pe_index: jax.Array  # [2, E] int32 pooled (coalesced) interface edges
    pe_mask: jax.Array  # [E] bool
    iedge_to_pie: jax.Array  # [Ei] int32 slot of pooled internal edge
    pie_index: jax.Array  # [2, Ei] int32 pooled internal edges
    pie_mask: jax.Array  # [Ei] bool

    # level-1 -> level-2 pooling plan (max_pool_x stage)
    assign1: jax.Array  # [C0] int32 cluster id in [0, C1), pad -> C1
    pool1_graph: jax.Array  # [C1] int32
    pool1_mask: jax.Array  # [C1] bool

    # targets
    y: jax.Array  # [G] float32 (class index stored as float for class tasks)
    y_mask: jax.Array  # [G] bool — False for padding graphs or missing targets

    # static metadata: truthy when every edge list (interface, internal,
    # and their pooled forms) is globally row-sorted and satisfies the
    # Pallas sorted-scatter window contract (ops/pallas/segment.py) —
    # models then route edge aggregation through the MXU kernel on TPU.
    # An int value is the tightest contract-satisfying kernel window.
    edges_sorted: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )

    # cluster member tables (optional; single-process runs): node ids
    # per level-0 cluster / cluster ids per level-1 cluster, pad
    # sentinel = source length — cluster max-pooling then runs as flat
    # row gathers instead of an unsorted scatter (`ops.dense.
    # member_max_pool`; scatter serializes on TPU). Omitted on meshes,
    # where the canonical shardings govern the pooling collectives.
    mem0_idx: Optional[jax.Array] = None  # [C0, M0] int32, pad -> N
    mem1_idx: Optional[jax.Array] = None  # [C1, M1] int32, pad -> C0

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.y.shape[0]

    @property
    def num_clusters0(self) -> int:
        return self.pool0_graph.shape[0]

    @property
    def num_clusters1(self) -> int:
        return self.pool1_graph.shape[0]


def _round_up(n: int, mult: int) -> int:
    return ((n + mult - 1) // mult) * mult if mult > 1 else n


@dataclass
class GraphPlan:
    """Per-graph pooling plan — batch-independent, so computable once
    per sample and reused across epochs (pooled-edge coalescing never
    crosses graphs; batch assembly is then pure concatenation)."""

    cluster0: np.ndarray  # [N] consecutive ids
    k0: int
    cluster1: np.ndarray  # [k0]
    k1: int
    pe_uniq: np.ndarray  # [P, 2] pooled coalesced interface edges
    pe_inv: np.ndarray  # [E_kept] slot per kept original edge
    pe_keep: np.ndarray  # [E] bool — edges surviving self-loop removal
    pie_uniq: np.ndarray  # [Pi, 2] pooled coalesced internal edges
    pie_inv: np.ndarray  # [Ei_kept]
    pie_keep: np.ndarray  # [Ei] bool


def _pool_edges_plan(c0, edge_index):
    mapped = c0[edge_index]
    keep = mapped[0] != mapped[1]
    if keep.any():
        uniq, inv = np.unique(mapped[:, keep].T, axis=0, return_inverse=True)
    else:
        uniq = np.zeros((0, 2), dtype=np.int64)
        inv = np.zeros(0, dtype=np.int64)
    return uniq.astype(np.int32), inv.astype(np.int32), keep


def make_graph_plan(s: GraphSample) -> GraphPlan:
    u0, c0 = np.unique(s.cluster0, return_inverse=True)
    u1, c1 = np.unique(s.cluster1, return_inverse=True)
    c0 = c0.astype(np.int32)
    pe_uniq, pe_inv, pe_keep = _pool_edges_plan(c0, s.edge_index)
    pie_uniq, pie_inv, pie_keep = _pool_edges_plan(c0, s.internal_edge_index)
    return GraphPlan(
        cluster0=c0,
        k0=len(u0),
        cluster1=c1.astype(np.int32),
        k1=len(u1),
        pe_uniq=pe_uniq,
        pe_inv=pe_inv,
        pe_keep=pe_keep,
        pie_uniq=pie_uniq,
        pie_inv=pie_inv,
        pie_keep=pie_keep,
    )


def collate(
    graphs: Sequence[GraphSample],
    *,
    n_pad: Optional[int] = None,
    e_pad: Optional[int] = None,
    ie_pad: Optional[int] = None,
    c0_pad: Optional[int] = None,
    c1_pad: Optional[int] = None,
    g_pad: Optional[int] = None,
    node_mult: int = 128,
    edge_mult: int = 512,
    plans: Optional[Sequence[GraphPlan]] = None,
    member_tables: bool = True,
    m0: Optional[int] = None,
    m1: Optional[int] = None,
) -> Tuple[GraphBatch, List[str]]:
    """Collate graphs into one padded :class:`GraphBatch`.

    Offsets edge indices and cluster ids per graph exactly as PyG batch
    collation + `get_preloaded_cluster` do in the reference
    (`community_pooling.py:25-30`). The pooling plans (consecutive
    cluster renumbering + pooled-edge coalescing) are per-graph and
    batch-independent; pass precomputed ``plans`` (see
    :func:`make_graph_plan`) to make collation pure array assembly —
    the loader caches them across epochs.
    """
    if not graphs:
        raise ValueError("empty batch")
    g = len(graphs)
    for s in graphs:
        if s.cluster0 is None or s.cluster1 is None:
            raise ValueError(
                f"graph {s.mol} has no precomputed clusters; run PreCluster"
            )
    if plans is None:
        plans = [make_graph_plan(s) for s in graphs]

    n_tot = sum(s.num_nodes for s in graphs)
    e_tot = sum(s.edge_index.shape[1] for s in graphs)
    ie_tot = sum(s.internal_edge_index.shape[1] for s in graphs)
    c0_tot = sum(p.k0 for p in plans)
    c1_tot = sum(p.k1 for p in plans)

    n_pad = n_pad or _round_up(n_tot, node_mult)
    e_pad = e_pad or _round_up(e_tot, edge_mult)
    ie_pad = ie_pad or _round_up(ie_tot, edge_mult)
    c0_pad = c0_pad or _round_up(c0_tot, node_mult)
    c1_pad = c1_pad or _round_up(c1_tot, node_mult)
    g_pad = g_pad or g

    f = graphs[0].num_features
    fe = graphs[0].edge_attr.shape[1]

    x = np.zeros((n_pad, f), dtype=np.float32)
    pos = np.zeros((n_pad, 3), dtype=np.float32)
    node_graph = np.full(n_pad, g_pad, dtype=np.int32)
    node_mask = np.zeros(n_pad, dtype=bool)
    edge_index = np.full((2, e_pad), n_pad, dtype=np.int32)
    edge_attr = np.zeros((e_pad, fe), dtype=np.float32)
    edge_mask = np.zeros(e_pad, dtype=bool)
    iedge_index = np.full((2, ie_pad), n_pad, dtype=np.int32)
    iedge_attr = np.zeros((ie_pad, fe), dtype=np.float32)
    iedge_mask = np.zeros(ie_pad, dtype=bool)
    assign0 = np.full(n_pad, c0_pad, dtype=np.int32)
    pool0_graph = np.full(c0_pad, g_pad, dtype=np.int32)
    pool0_mask = np.zeros(c0_pad, dtype=bool)
    assign1 = np.full(c0_pad, c1_pad, dtype=np.int32)
    pool1_graph = np.full(c1_pad, g_pad, dtype=np.int32)
    pool1_mask = np.zeros(c1_pad, dtype=bool)
    y = np.zeros(g_pad, dtype=np.float32)
    y_mask = np.zeros(g_pad, dtype=bool)

    edge_to_pe = np.full(e_pad, e_pad, dtype=np.int32)
    pe_index = np.full((2, e_pad), c0_pad, dtype=np.int32)
    pe_mask = np.zeros(e_pad, dtype=bool)
    iedge_to_pie = np.full(ie_pad, ie_pad, dtype=np.int32)
    pie_index = np.full((2, ie_pad), c0_pad, dtype=np.int32)
    pie_mask = np.zeros(ie_pad, dtype=bool)

    mols: List[str] = []
    n_off = e_off = ie_off = c0_off = c1_off = p_off = pi_off = 0
    for gi, s in enumerate(graphs):
        n, e, ie = s.num_nodes, s.edge_index.shape[1], s.internal_edge_index.shape[1]
        plan = plans[gi]
        cluster0, cluster1, k0, k1 = plan.cluster0, plan.cluster1, plan.k0, plan.k1
        if cluster1.shape[0] != k0:
            raise ValueError(
                f"graph {s.mol}: depth_1 length {cluster1.shape[0]} != "
                f"depth_0 cluster count {k0}"
            )
        x[n_off : n_off + n] = s.x
        pos[n_off : n_off + n] = s.pos
        node_graph[n_off : n_off + n] = gi
        node_mask[n_off : n_off + n] = True
        edge_index[:, e_off : e_off + e] = s.edge_index + n_off
        edge_attr[e_off : e_off + e] = s.edge_attr
        edge_mask[e_off : e_off + e] = True
        iedge_index[:, ie_off : ie_off + ie] = s.internal_edge_index + n_off
        iedge_attr[ie_off : ie_off + ie] = s.internal_edge_attr
        iedge_mask[ie_off : ie_off + ie] = True
        assign0[n_off : n_off + n] = cluster0 + c0_off
        pool0_graph[c0_off : c0_off + k0] = gi
        pool0_mask[c0_off : c0_off + k0] = True
        assign1[c0_off : c0_off + k0] = cluster1 + c1_off
        pool1_graph[c1_off : c1_off + k1] = gi
        pool1_mask[c1_off : c1_off + k1] = True
        if s.y is not None:
            y[gi] = s.y
            y_mask[gi] = True
        # pooled-edge assembly from the per-graph plan: cluster ids are
        # strictly increasing with graph index, so concatenating the
        # per-graph (sorted) coalesced edge lists reproduces the global
        # torch-sparse sorted coalesce order
        npe = plan.pe_uniq.shape[0]
        if p_off + npe > e_pad:
            raise ValueError("coalesced edges exceed edge capacity")
        edge_to_pe[e_off : e_off + e][plan.pe_keep] = plan.pe_inv + p_off
        pe_index[:, p_off : p_off + npe] = plan.pe_uniq.T + c0_off
        pe_mask[p_off : p_off + npe] = True
        npie = plan.pie_uniq.shape[0]
        if pi_off + npie > ie_pad:
            raise ValueError("coalesced internal edges exceed capacity")
        iedge_to_pie[ie_off : ie_off + ie][plan.pie_keep] = plan.pie_inv + pi_off
        pie_index[:, pi_off : pi_off + npie] = plan.pie_uniq.T + c0_off
        pie_mask[pi_off : pi_off + npie] = True
        mols.append(s.mol)
        n_off += n
        e_off += e
        ie_off += ie
        c0_off += k0
        c1_off += k1
        p_off += npe
        pi_off += npie

    # Pallas sorted-scatter eligibility: every edge family must be
    # globally row-sorted and satisfy the kernel's window contract
    # (ops/pallas/segment.py). The loader emits per-graph row-sorted
    # edges, so this holds for real data; the check costs O(E) numpy.
    # `edges_sorted` carries the TIGHTEST common window (an int; the
    # kernel's MXU work is proportional to it — real batches need ~256
    # where the worst case is 640), or False when any family is
    # unsorted.
    from deeprank_gnn_tpu.ops.pallas.segment import (
        ALIGN,
        WINDOW,
        required_window,
    )

    _windows = [
        required_window(edge_index[0], n_pad),
        required_window(pe_index[0], c0_pad),
        required_window(iedge_index[0], n_pad),
        required_window(pie_index[0], c0_pad),
    ]
    if any(w is None for w in _windows):
        edges_sorted = False
    else:
        edges_sorted = max(_windows)
        # STATIC capacity-derived window when the batch is small: any
        # sorted block's rows fit in [align(first), n_pad + ALIGN), so
        # a window of n_pad + ALIGN always satisfies the contract and —
        # unlike the content-tightest window — is CONSTANT across the
        # bucket's batches (one compiled executable per bucket; the
        # AOT cache requires stable static pytree metadata).
        cap_window = -(-(n_pad + ALIGN) // ALIGN) * ALIGN
        if cap_window <= WINDOW:
            edges_sorted = cap_window

    # flat cluster member tables (see GraphBatch field docs): pooling
    # as row gathers instead of unsorted scatters. M comes from the
    # caller's dataset-wide caps when given (stable compiled shapes
    # across batches), else from this batch.
    mem0_idx = mem1_idx = None
    if member_tables:
        mem0_idx = _flat_member_table(assign0, c0_pad, n_pad, m0)
        mem1_idx = _flat_member_table(assign1, c1_pad, c0_pad, m1)

    batch = GraphBatch(
        x=x,
        pos=pos,
        node_graph=node_graph,
        node_mask=node_mask,
        edge_index=edge_index,
        edge_attr=edge_attr,
        edge_mask=edge_mask,
        iedge_index=iedge_index,
        iedge_attr=iedge_attr,
        iedge_mask=iedge_mask,
        assign0=assign0,
        pool0_graph=pool0_graph,
        pool0_mask=pool0_mask,
        edge_to_pe=edge_to_pe,
        pe_index=pe_index,
        pe_mask=pe_mask,
        iedge_to_pie=iedge_to_pie,
        pie_index=pie_index,
        pie_mask=pie_mask,
        assign1=assign1,
        pool1_graph=pool1_graph,
        pool1_mask=pool1_mask,
        y=y,
        y_mask=y_mask,
        edges_sorted=edges_sorted,
        mem0_idx=mem0_idx,
        mem1_idx=mem1_idx,
    )
    return batch, mols


def _flat_member_table(
    assign: np.ndarray, c: int, pad_val: int, m: Optional[int] = None
) -> np.ndarray:
    """[len] assignment (pad -> c) -> [c, M] member table (pad ->
    pad_val), members in stable source order per cluster."""
    idx = np.flatnonzero(assign < c)
    a = assign[idx]
    order = np.argsort(a, kind="stable")
    sa = a[order]
    members = idx[order]
    starts = np.searchsorted(sa, sa, "left")
    rank = np.arange(len(sa)) - starts
    need = int(rank.max()) + 1 if len(rank) else 1
    if m is None:
        m = max(8, -(-need // 8) * 8)
    elif need > m:
        raise ValueError(f"cluster size {need} exceeds member cap {m}")
    tab = np.full((c, m), pad_val, np.int32)
    tab[sa, rank] = members
    return tab


def _caps_from_sizes(sizes, bs: int, node_mult: int, edge_mult: int) -> dict:
    return {
        "n_pad": _round_up(bs * max(s["n"] for s in sizes), node_mult),
        "e_pad": _round_up(bs * max(s["e"] for s in sizes), edge_mult),
        "ie_pad": _round_up(bs * max(s["ie"] for s in sizes), edge_mult),
        "c0_pad": _round_up(max(1, bs * max(s["c0"] for s in sizes)), node_mult),
        "c1_pad": _round_up(max(1, bs * max(s["c1"] for s in sizes)), node_mult),
        # member-table capacities (max cluster sizes): stable compiled
        # shapes for the flat pooling gathers across batches
        "m0": max(8, -(-max(s.get("m0", 0) for s in sizes) // 8) * 8),
        "m1": max(8, -(-max(s.get("m1", 0) for s in sizes) // 8) * 8),
    }


class GraphLoader:
    """Size-bucketed batch iterator over an :class:`HDF5DataSet`.

    Pads every batch to `batch_size` graphs and to node/edge bucket
    multiples. With ``num_buckets > 1`` graphs are partitioned into
    size-quantile buckets (by node count), each with its own static
    capacity — so heterogeneous datasets don't pad every batch to the
    global worst case (the reference's dynamic PyG collation never pays
    padding at all, `NeuralNet.py:153-175`; buckets bound our padding
    waste at the cost of one XLA executable per bucket). Bucket
    membership and capacities are computed once at construction and are
    stable across epochs; batches never mix buckets.

    ``padding_stats`` reports the realized efficiency (valid/padded
    entries) of the last completed epoch.
    """

    def __init__(
        self,
        dataset: HDF5DataSet,
        batch_size: int = 32,
        shuffle: bool = False,
        seed: int = 0,
        node_mult: int = 128,
        edge_mult: int = 512,
        drop_last: bool = False,
        static_shapes: bool = True,
        layout: str = "sparse",
        cache_samples: bool = True,
        num_buckets: int = 1,
        host_batch_slice: Optional[slice] = None,
        device_cache: bool = False,
        device_cache_bytes: int = 2 * 1024**3,
        store_sharding=None,
        precompute_ops: Optional[bool] = None,
        store_pack: str = "lossless",
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.node_mult = node_mult
        self.edge_mult = edge_mult
        self.drop_last = drop_last
        self.layout = layout
        # multi-host dense ingest: positions of each GLOBAL batch this
        # process materializes (`parallel.mesh.dense_local_slice`).
        # Sample payloads outside the slice are never read; every host
        # sees the same seeded shuffle order, so slices are disjoint
        # and jointly cover the global batch.
        if host_batch_slice is not None and layout != "dense":
            raise ValueError("host_batch_slice requires layout='dense'")
        self.host_batch_slice = host_batch_slice
        # device-resident dataset cache (dense layout only): upload the
        # dense-collated dataset to HBM once; every epoch's batches are
        # then assembled ON DEVICE by a fused gather — zero steady-state
        # host->device traffic (data/device_store.py). Falls back to
        # streaming when the padded store exceeds `device_cache_bytes`.
        if device_cache not in (False, True, "chunked"):
            raise ValueError("device_cache must be False, True or 'chunked'")
        if device_cache and layout != "dense":
            raise ValueError("device_cache requires layout='dense'")
        if device_cache and host_batch_slice is not None:
            raise ValueError(
                "device_cache and multi-host ingest are exclusive"
            )
        self.device_cache = device_cache
        self.device_cache_bytes = device_cache_bytes
        # halfword packing of the device store ("lossless" | "bf16" —
        # the latter halves raw fp32 payload bytes at bf16 precision)
        if store_pack not in ("lossless", "bf16"):
            raise ValueError("store_pack must be 'lossless' or 'bf16'")
        self.store_pack = store_pack
        # dense collation can precompute the per-graph aggregation
        # operators (`ops.dense.adj_conv`): always on for the device
        # store (one-time build, fastest step), opt-in for streaming
        # (costs extra host work + transfer bytes per batch)
        self._precompute_requested = precompute_ops is not None
        if precompute_ops is None:
            precompute_ops = device_cache
        if precompute_ops and layout != "dense":
            raise ValueError("precompute_ops requires layout='dense'")
        self.precompute_ops = precompute_ops
        # mesh runs: a replicated `jax.sharding.Sharding` for the store
        # — the batch gather is then local on every device and the
        # training step's input resharding slices locally (no host
        # link, no collectives)
        self.store_sharding = store_sharding
        self._store = None
        self._chunk_store = None
        # loaded GraphSamples are immutable; caching them avoids
        # re-reading the HDF5 every epoch (disable for datasets larger
        # than host memory)
        self.cache_samples = cache_samples
        self._sample_cache: dict = {}
        self._plan_cache: dict = {}
        self._rng = np.random.RandomState(seed)
        self._caps = None
        self._dense_caps = None
        self._buckets = None  # list of (indices ndarray, caps dict)
        self.padding_stats: dict = {}

        def _scan_sizes():
            sizes, idx = [], []
            for i in range(len(dataset)):
                try:
                    sizes.append(dataset.graph_sizes(i))
                    idx.append(i)
                except Exception:
                    # molecule vanished / unreadable: the iterator will
                    # skip it too (robustness parity with the reference's
                    # skip-and-continue handling)
                    pass
            return sizes, np.asarray(idx)

        if layout == "dense" and len(dataset) > 0:
            sizes, _ = _scan_sizes()
            self._dense_caps = {
                # node capacity covers the run-padded cluster layout
                # (collate_dense cluster_sort; falls back to n when a
                # graph has no stored clusters yet)
                "ng": max(
                    8,
                    -(-max(s.get("np8", s["n"]) for s in sizes) // 8) * 8,
                ),
                "eg": max(128, -(-max(s["e"] for s in sizes) // 128) * 128),
                "c0g": max(8, -(-max(s["c0"] for s in sizes) // 8) * 8),
                "c1g": max(8, -(-max(s["c1"] for s in sizes) // 8) * 8),
                "m0g": max(
                    8, -(-max(s.get("m0", 0) for s in sizes) // 8) * 8
                ),
                "m1g": max(
                    8, -(-max(s.get("m1", 0) for s in sizes) // 8) * 8
                ),
                "mt0g": max(
                    1, max(s.get("mt0", 1) for s in sizes)
                ),
            }
        if static_shapes and layout == "sparse" and len(dataset) > 0:
            sizes, idx = _scan_sizes()
            # one bucket needs at least batch_size graphs to be worth a
            # separate executable
            nb = max(1, min(num_buckets, len(sizes) // max(1, batch_size)))
            if nb <= 1:
                self._caps = _caps_from_sizes(
                    sizes, batch_size, node_mult, edge_mult
                )
            else:
                order = np.argsort([s["n"] for s in sizes], kind="stable")
                splits = np.array_split(order, nb)
                self._buckets = []
                for part in splits:
                    if len(part) == 0:
                        continue
                    bsizes = [sizes[j] for j in part]
                    self._buckets.append(
                        (
                            idx[part],
                            _caps_from_sizes(
                                bsizes, batch_size, node_mult, edge_mult
                            ),
                        )
                    )

    def __len__(self) -> int:
        if self._buckets is not None:
            total = 0
            for indices, _ in self._buckets:
                n = len(indices)
                if self.drop_last:
                    total += n // self.batch_size
                else:
                    total += (n + self.batch_size - 1) // self.batch_size
            return total
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _get_sample(self, i: int):
        if not self.cache_samples:
            return self.dataset.get(i)
        if i not in self._sample_cache:
            self._sample_cache[i] = self.dataset.get(i)
        return self._sample_cache[i]

    def _get_plan(self, i: int, sample):
        if not self.cache_samples:
            return make_graph_plan(sample)
        if i not in self._plan_cache:
            self._plan_cache[i] = make_graph_plan(sample)
        return self._plan_cache[i]

    def _emit_sparse(self, idx, caps) -> Optional[Tuple[GraphBatch, List[str]]]:
        pairs = [(int(i), self._get_sample(int(i))) for i in idx]
        pairs = [(i, s) for i, s in pairs if s is not None]
        if not pairs:
            return None
        graphs = [s for _, s in pairs]
        plans = [self._get_plan(i, s) for i, s in pairs]
        out = collate(
            graphs,
            g_pad=self.batch_size,
            node_mult=self.node_mult,
            edge_mult=self.edge_mult,
            plans=plans,
            # member tables only single-process: on a mesh the
            # canonical shardings govern the pooling collectives (the
            # tables' node-space gathers would fight the partitioner)
            member_tables=self.store_sharding is None,
            **(caps or {}),
        )
        st = self._epoch_stats
        batch = out[0]
        st["valid_edges"] += int(np.asarray(batch.edge_mask).sum())
        st["padded_edges"] += batch.edge_mask.shape[0]
        st["valid_nodes"] += int(np.asarray(batch.node_mask).sum())
        st["padded_nodes"] += batch.node_mask.shape[0]
        st["num_batches"] += 1
        return out

    def _finish_epoch_stats(self) -> None:
        st = self._epoch_stats
        if st["padded_edges"]:
            st["edge_efficiency"] = st["valid_edges"] / st["padded_edges"]
            st["node_efficiency"] = st["valid_nodes"] / st["padded_nodes"]
        self.padding_stats = st

    def _maybe_build_store(self) -> bool:
        """Build the device-resident store on first use; False when the
        dataset is empty or the padded store exceeds the byte budget
        (streaming fallback)."""
        if self._store is not None:
            return True
        if self._dense_caps is None or len(self.dataset) == 0:
            return False
        from deeprank_gnn_tpu.data.device_store import (
            build_store_from_loader,
            estimate_store_bytes,
        )

        nf, ef = self.dataset.feature_dims()
        caps = dict(self._dense_caps)
        caps.setdefault("pg", caps["eg"])
        est = estimate_store_bytes(
            len(self.dataset), num_features=nf, num_edge_features=ef,
            precompute_ops=self.precompute_ops, pack=self.store_pack, **caps,
        )
        if est > self.device_cache_bytes:
            print(
                f"device_cache: padded store ~{est / 1e9:.2f} GB exceeds "
                f"budget {self.device_cache_bytes / 1e9:.2f} GB; streaming "
                f"(device_cache='chunked' rotates it through HBM instead)"
            )
            self.device_cache = False
            if not self._precompute_requested:
                # the operator fields defaulted on only because of the
                # cache; a streamed epoch shouldn't pay their host work
                # and transfer bytes unless explicitly asked
                self.precompute_ops = False
            return False
        self._store = build_store_from_loader(self, device=self.store_sharding)
        return self._store is not None

    def _maybe_build_chunks(self) -> bool:
        """Build the rotating chunk store (device_cache='chunked'):
        datasets beyond the HBM budget stay host-packed and rotate
        through device memory two chunks at a time, the next chunk's
        async upload overlapping the current chunk's compute."""
        if self._chunk_store is not None:
            return True
        if self._dense_caps is None or len(self.dataset) == 0:
            return False
        from deeprank_gnn_tpu.data.device_store import (
            build_chunked_store_from_loader,
        )

        self._chunk_store = build_chunked_store_from_loader(
            self, chunk_bytes=max(1, self.device_cache_bytes // 2)
        )
        return self._chunk_store is not None

    def _iter_chunked(self):
        cs = self._chunk_store
        st = self._epoch_stats
        corder = np.arange(cs.num_chunks)
        if self.shuffle:
            self._rng.shuffle(corder)
        cur = cs.upload(int(corder[0]))
        for pos, ci in enumerate(corder):
            ci = int(ci)
            nxt = None
            if pos + 1 < len(corder):
                # async: the next chunk's transfer overlaps this
                # chunk's batches
                nxt = cs.upload(int(corder[pos + 1]))
            start, clen = cs.chunk_ranges[ci]
            local = np.arange(clen)
            if self.shuffle:
                self._rng.shuffle(local)
            for bstart in range(0, clen, self.batch_size):
                sel = local[bstart : bstart + self.batch_size]
                if self.drop_last and len(sel) < self.batch_size:
                    break
                batch, mols = cs.batch(cur, ci, sel, self.batch_size)
                st["valid_edges"] += int(cs.edge_counts[start + sel].sum())
                st["padded_edges"] += int(np.prod(batch.edge_mask.shape))
                st["valid_nodes"] += int(cs.node_counts[start + sel].sum())
                st["padded_nodes"] += int(np.prod(batch.node_mask.shape))
                st["num_batches"] += 1
                yield batch, mols
            cur = nxt  # previous chunk's buffers free when unreferenced
        self._finish_epoch_stats()

    def device_epoch_plan(self):
        """Host-side plan of one epoch over the device store: the slot
        matrix a scanned epoch (`train/scan.py`) consumes, plus per-batch
        molecule names. Consumes the same RNG stream as an iterated
        epoch, so scanned and looped runs see identical batch orders.

        Returns ``(slots [B, batch_size] int32, mols_per_batch)`` or
        None when the store is unavailable (empty dataset / byte budget
        exceeded / non-dense layout). Updates ``padding_stats``.
        """
        if not (self.device_cache is True and self._maybe_build_store()):
            return None
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        self._epoch_stats = {
            "valid_edges": 0,
            "padded_edges": 0,
            "valid_nodes": 0,
            "padded_nodes": 0,
            "num_batches": 0,
        }
        st = self._epoch_stats
        store = self._store
        eg = store.caps["eg"]
        ng = store.caps["ng"]
        rows, mols_per_batch = [], []
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                break
            slots = np.asarray(
                [
                    store.slot_of_index[int(i)]
                    for i in idx
                    if int(i) in store.slot_of_index
                ],
                dtype=np.int32,
            )
            if len(slots) == 0:
                continue
            row = np.full(self.batch_size, store.pad_slot, dtype=np.int32)
            row[: len(slots)] = slots
            rows.append(row)
            mols_per_batch.append([store.mols[int(s)] for s in slots])
            st["valid_edges"] += int(store.edge_counts[slots].sum())
            st["padded_edges"] += self.batch_size * eg
            st["valid_nodes"] += int(store.node_counts[slots].sum())
            st["padded_nodes"] += self.batch_size * ng
            st["num_batches"] += 1
        self._finish_epoch_stats()
        if not rows:
            return None
        return np.stack(rows), mols_per_batch

    def _iter_device(self):
        """Epoch of device-gathered batches from the resident store."""
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        st = self._epoch_stats
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                break
            slots = np.asarray(
                [
                    self._store.slot_of_index[int(i)]
                    for i in idx
                    if int(i) in self._store.slot_of_index
                ],
                dtype=np.int32,
            )
            if len(slots) == 0:
                continue
            batch, mols = self._store.batch(slots, self.batch_size)
            st["valid_edges"] += int(self._store.edge_counts[slots].sum())
            st["padded_edges"] += int(np.prod(batch.edge_mask.shape))
            st["valid_nodes"] += int(self._store.node_counts[slots].sum())
            st["padded_nodes"] += int(np.prod(batch.node_mask.shape))
            st["num_batches"] += 1
            yield batch, mols
        self._finish_epoch_stats()

    def chunk_epoch_plan(self):
        """Host-side plan of one epoch over the rotating chunk store:
        per-chunk slot matrices a per-chunk scan consumes (the chunked
        analog of :meth:`device_epoch_plan`). Consumes the same RNG
        stream as :meth:`_iter_chunked` (chunk-order shuffle, then a
        within-chunk shuffle per chunk), so scanned and looped chunked
        runs see identical batch orders.

        Returns a list of ``(ci, slots [B, batch_size] int32,
        mols_per_batch)`` — slots are CHUNK-LOCAL (pad = the chunk's
        own pad slot, index ``clen``) — or None when the chunk store
        is unavailable. Updates ``padding_stats``.
        """
        if not (self.device_cache == "chunked" and self._maybe_build_chunks()):
            return None
        cs = self._chunk_store
        # If the plan comes out empty (drop_last with every chunk
        # smaller than batch_size) the caller falls back to the looped
        # path — restore the RNG so that path draws the same stream a
        # pure looped run would.
        rng_state = self._rng.get_state()
        self._epoch_stats = {
            "valid_edges": 0,
            "padded_edges": 0,
            "valid_nodes": 0,
            "padded_nodes": 0,
            "num_batches": 0,
        }
        st = self._epoch_stats
        eg = cs.caps["eg"]
        ng = cs.caps["ng"]
        corder = np.arange(cs.num_chunks)
        if self.shuffle:
            self._rng.shuffle(corder)
        plan = []
        for ci in corder:
            ci = int(ci)
            start, clen = cs.chunk_ranges[ci]
            local = np.arange(clen)
            if self.shuffle:
                self._rng.shuffle(local)
            rows, mols_per_batch = [], []
            for bstart in range(0, clen, self.batch_size):
                sel = local[bstart : bstart + self.batch_size]
                if self.drop_last and len(sel) < self.batch_size:
                    break
                row = np.full(self.batch_size, clen, dtype=np.int32)
                row[: len(sel)] = sel
                rows.append(row)
                mols_per_batch.append(
                    [cs.mols[start + int(s)] for s in sel]
                )
                st["valid_edges"] += int(cs.edge_counts[start + sel].sum())
                st["padded_edges"] += self.batch_size * eg
                st["valid_nodes"] += int(cs.node_counts[start + sel].sum())
                st["padded_nodes"] += self.batch_size * ng
                st["num_batches"] += 1
            if rows:
                plan.append((ci, np.stack(rows), mols_per_batch))
        self._finish_epoch_stats()
        if not plan:
            self._rng.set_state(rng_state)
            return None
        return plan

    def __iter__(self) -> Iterator[Tuple[GraphBatch, List[str]]]:
        self._epoch_stats = {
            "valid_edges": 0,
            "padded_edges": 0,
            "valid_nodes": 0,
            "padded_nodes": 0,
            "num_batches": 0,
        }
        if self.layout == "dense":
            from deeprank_gnn_tpu.data.dense_batch import collate_dense

            if self.device_cache == "chunked" and self._maybe_build_chunks():
                yield from self._iter_chunked()
                return
            if self.device_cache is True and self._maybe_build_store():
                yield from self._iter_device()
                return
            hs = self.host_batch_slice
            g_pad = self.batch_size
            dims = {}
            if hs is not None:
                g_pad = hs.stop - hs.start
                nf, ef = self.dataset.feature_dims()
                dims = {"num_features": nf, "num_edge_features": ef}
            order = np.arange(len(self.dataset))
            if self.shuffle:
                self._rng.shuffle(order)
            for start in range(0, len(order), self.batch_size):
                idx = order[start : start + self.batch_size]
                if self.drop_last and len(idx) < self.batch_size:
                    return
                if hs is not None:
                    idx = idx[hs]
                pairs = [(int(i), self._get_sample(int(i))) for i in idx]
                pairs = [(i, s) for i, s in pairs if s is not None]
                if not pairs and hs is None:
                    continue
                graphs = [s for _, s in pairs]
                plans = [self._get_plan(i, s) for i, s in pairs]
                caps = dict(self._dense_caps or {})
                # pooled-edge capacity bounded by the edge capacity
                caps.setdefault("pg", caps.get("eg"))
                yield collate_dense(
                    graphs, g_pad=g_pad, plans=plans,
                    precompute_ops=self.precompute_ops, **caps, **dims,
                )
            return
        # sparse layout: per-bucket static shapes
        if self._buckets is not None:
            chunks = []
            for indices, caps in self._buckets:
                order = indices.copy()
                if self.shuffle:
                    self._rng.shuffle(order)
                for start in range(0, len(order), self.batch_size):
                    sel = order[start : start + self.batch_size]
                    if self.drop_last and len(sel) < self.batch_size:
                        continue
                    chunks.append((sel, caps))
            if self.shuffle:
                self._rng.shuffle(chunks)
            for sel, caps in chunks:
                out = self._emit_sparse(sel, caps)
                if out is not None:
                    yield out
            self._finish_epoch_stats()
            return
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                break
            out = self._emit_sparse(idx, self._caps)
            if out is not None:
                yield out
        self._finish_epoch_stats()
