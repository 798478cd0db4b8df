"""Explicit halo-exchange edge-parallel layout (`layout="halo"`).

The GSPMD sparse layout (`parallel/mesh.py`) annotates nodes over 'dp'
and edges over 'ep' and lets XLA derive the collectives; that works but
the derived pattern re-materializes full node arrays between the edge
and node shardings and degrades with device count (see SCALING.md).
This module is the hand-built alternative the BASELINE north star asks
for: **boundary-node feature exchange overlapped with local
aggregation**, expressed with `jax.shard_map` + `lax.all_to_all` so the
communication volume is exactly the boundary set, not the node array.

Design (reference hot loop: `ginet.py:57-73` gather -> GEMM -> scatter):

- **Row-range partitioning.** The collated batch's edges are sorted by
  destination (`row`); nodes are split into D contiguous chunks of
  ``Nl = N/D`` and every edge lives on the shard that owns its row.
  The scatter side of message passing is therefore *fully local* — no
  communication ever touches the segment-sum.
- **Host-planned halo.** The only remote data is ``x[col]`` for edges
  whose source lives on another shard. The collator knows exactly which
  rows each shard needs, so `partition_batch` precomputes a static
  all-to-all plan: ``send_idx[d, p]`` = the local node rows shard d
  ships to peer p. On device the exchange is one
  ``lax.all_to_all`` of the *boundary rows only* (H per peer), not an
  all-gather of the node array.
- **Overlap by construction.** Each shard's edges are split into a
  local-source group (consumes only local ``xw``) and a remote-source
  group (consumes the halo). The local segment-sum has no data
  dependency on the all-to-all, so XLA's latency-hiding scheduler runs
  the exchange concurrently with local aggregation; the remote
  contribution is added on arrival.
- **Small levels replicate.** After conv1, cluster counts shrink ~4x
  (and again at level 2); partial per-shard pooling results combine
  with one small `all_gather` max / `psum`, after which the pooled
  graph, readout and MLP head are replicated — data volumes there are
  1-2 orders of magnitude below level 0.

The per-shard edge groups keep the loader's row-sorted order, so the
Pallas windowed-scatter MXU kernel (`ops/pallas/segment.py`) still
drives every local segment-sum on TPU.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deeprank_gnn_tpu.data.batch import GraphBatch

try:  # jax >= 0.6 exports shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def make_halo_mesh(devices=None) -> Mesh:
    """1-D ('ep',) mesh over all (or the given) devices."""
    devices = np.asarray(
        list(devices) if devices is not None else jax.devices()
    )
    return Mesh(devices.reshape(-1), ("ep",))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HaloBatch:
    """A row-range-partitioned :class:`GraphBatch`.

    Per-shard leaves carry a leading device axis ``[D, ...]`` (sharded
    over 'ep'); pooled-level / target leaves are replicated. Inside the
    shard_map'd step each shard sees its ``[1, ...]`` block
    (:meth:`local`).
    """

    # -- per-shard, leading axis D --
    x: jax.Array  # [D, Nl, F] node features (chunked)
    assign0: jax.Array  # [D, Nl] global cluster id, pad -> C0
    send_idx: jax.Array  # [D, D, H] local rows shard d sends to peer p
    loc_rows: jax.Array  # [D, El] local row ids, pad -> Nl
    loc_cols: jax.Array  # [D, El] local col ids
    loc_e2pe: jax.Array  # [D, El] pooled-edge slot, pad -> Pe
    loc_eattr: jax.Array  # [D, El, Fe]
    rem_rows: jax.Array  # [D, Er] local row ids, pad -> Nl
    rem_cols: jax.Array  # [D, Er] ids into [xw | halo], i.e. Nl + s*H + j
    rem_e2pe: jax.Array  # [D, Er]
    rem_eattr: jax.Array  # [D, Er, Fe]
    # internal-edge family (used by GINet(internal_tower=True) etc.)
    isend_idx: jax.Array  # [D, D, Hi]
    iloc_rows: jax.Array  # [D, Eli]
    iloc_cols: jax.Array  # [D, Eli]
    iloc_e2pie: jax.Array  # [D, Eli]
    iloc_eattr: jax.Array  # [D, Eli, Fe]
    irem_rows: jax.Array  # [D, Eri]
    irem_cols: jax.Array  # [D, Eri]
    irem_e2pie: jax.Array  # [D, Eri]
    irem_eattr: jax.Array  # [D, Eri, Fe]

    # -- replicated pooled-level plan + targets --
    pe_index: jax.Array  # [2, Pe] pooled interface edges, pad -> C0
    pie_index: jax.Array  # [2, Pie] pooled internal edges, pad -> C0
    assign1: jax.Array  # [C0] level-2 cluster id, pad -> C1
    pool1_graph: jax.Array  # [C1] graph id, pad -> G
    y: jax.Array  # [G]
    y_mask: jax.Array  # [G]

    # static: every local row array satisfies the Pallas sorted-window
    # contract (checked per shard at partition time)
    edges_sorted: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )

    # cluster member tables (scatter-free pooling; see `ops.dense.
    # member_max_pool`): per-shard LOCAL node ids per level-0 cluster
    # (sharded; partial maxes combine across shards), and the
    # replicated level-1 table
    mem0_loc: jax.Array = None  # [D, C0, Ml] int32, pad -> Nl
    mem1_idx: jax.Array = None  # [C1, M1] int32, pad -> C0

    # ---- shape-derived sizes (all static under jit) ----
    @property
    def num_shards(self) -> int:
        return self.send_idx.shape[1]  # send_idx [*, D, H]

    @property
    def nl(self) -> int:
        return self.x.shape[-2]

    @property
    def num_clusters0(self) -> int:
        return self.assign1.shape[0]

    @property
    def num_clusters1(self) -> int:
        return self.pool1_graph.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.y.shape[0]

    def local(self) -> "HaloBatch":
        """Inside shard_map: squeeze the [1, ...] device axis off the
        per-shard leaves (replicated leaves pass through)."""
        kw = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if f.name in _SHARDED_FIELDS:
                kw[f.name] = jnp.squeeze(v, axis=0)
            else:
                kw[f.name] = v
        return HaloBatch(**kw)


_SHARDED_FIELDS = frozenset(
    {
        "x", "assign0", "send_idx",
        "loc_rows", "loc_cols", "loc_e2pe", "loc_eattr",
        "rem_rows", "rem_cols", "rem_e2pe", "rem_eattr",
        "isend_idx",
        "iloc_rows", "iloc_cols", "iloc_e2pie", "iloc_eattr",
        "irem_rows", "irem_cols", "irem_e2pie", "irem_eattr",
        "mem0_loc",
    }
)


def halo_specs(hb: HaloBatch) -> HaloBatch:
    """A HaloBatch of PartitionSpecs matching ``hb``'s treedef."""
    kw = {
        f.name: (P("ep") if f.name in _SHARDED_FIELDS else P())
        for f in dataclasses.fields(hb)
        if f.name != "edges_sorted"
    }
    return HaloBatch(**kw, edges_sorted=hb.edges_sorted)


def shard_halo_batch(hb: HaloBatch, mesh: Mesh) -> HaloBatch:
    """Device-put with the canonical halo shardings."""
    specs = halo_specs(hb)

    def put(arr, spec):
        return jax.device_put(np.asarray(arr), NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(
        put,
        hb,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


# ---------------------------------------------------------------------------
# host-side partitioning


def _round8(n: int) -> int:
    return max(8, ((n + 7) // 8) * 8)


def _split_edge_family(
    rows: np.ndarray,
    cols: np.ndarray,
    e2p: np.ndarray,
    eattr: np.ndarray,
    mask: np.ndarray,
    nl: int,
    d: int,
    p_cap: int,
):
    """Partition one (row-sorted) edge family into per-shard local /
    remote groups plus the all-to-all send plan."""
    rows = rows[mask]
    cols = cols[mask]
    e2p = e2p[mask]
    eattr = eattr[mask]
    fe = eattr.shape[1]
    owner = rows // nl
    col_owner = cols // nl

    per = []  # (loc_r, loc_c, loc_p, loc_a, rem_r, rem_c_owner_col, rem_p, rem_a)
    need: List[List[np.ndarray]] = []
    for dd in range(d):
        sel = owner == dd
        r, c, p2, a = rows[sel] - dd * nl, cols[sel], e2p[sel], eattr[sel]
        co = col_owner[sel]
        loc = co == dd
        per.append((r[loc], c[loc] - dd * nl, p2[loc], a[loc],
                    r[~loc], c[~loc], co[~loc], p2[~loc], a[~loc]))
        need.append(
            [np.unique(c[~loc][co[~loc] == s]) for s in range(d)]
        )

    h = _round8(max((len(u) for row in need for u in row), default=1))
    send_idx = np.zeros((d, d, h), dtype=np.int32)
    for dd in range(d):
        for s in range(d):
            u = need[dd][s]
            send_idx[s, dd, : len(u)] = u - s * nl

    el = _round8(max(len(p[0]) for p in per))
    er = _round8(max(len(p[4]) for p in per))
    loc_rows = np.full((d, el), nl, np.int32)
    loc_cols = np.zeros((d, el), np.int32)
    loc_e2p = np.full((d, el), p_cap, np.int32)
    loc_eattr = np.zeros((d, el, fe), np.float32)
    rem_rows = np.full((d, er), nl, np.int32)
    rem_cols = np.zeros((d, er), np.int32)
    rem_e2p = np.full((d, er), p_cap, np.int32)
    rem_eattr = np.zeros((d, er, fe), np.float32)
    for dd, (lr, lc, lp, la, rr, rc, rco, rp, ra) in enumerate(per):
        k = len(lr)
        loc_rows[dd, :k] = lr
        loc_cols[dd, :k] = lc
        loc_e2p[dd, :k] = lp
        loc_eattr[dd, :k] = la
        k = len(rr)
        rem_rows[dd, :k] = rr
        # position of each remote col within its owner's sorted need set
        j = np.empty(k, np.int64)
        for s in range(d):
            m = rco == s
            j[m] = np.searchsorted(need[dd][s], rc[m])
        rem_cols[dd, :k] = nl + rco * h + j
        rem_e2p[dd, :k] = rp
        rem_eattr[dd, :k] = ra
    return send_idx, loc_rows, loc_cols, loc_e2p, loc_eattr, \
        rem_rows, rem_cols, rem_e2p, rem_eattr


def partition_batch(batch: GraphBatch, d: int) -> HaloBatch:
    """Row-range-partition a host (numpy) :class:`GraphBatch` over
    ``d`` shards and precompute the halo plans. Pure integer/number
    bookkeeping — runs on host at collate rate."""
    n = batch.num_nodes
    c0 = batch.num_clusters0
    x = np.asarray(batch.x)
    assign0 = np.asarray(batch.assign0)
    if n % d:
        extra = d * (-(-n // d)) - n
        x = np.pad(x, ((0, extra), (0, 0)))
        assign0 = np.pad(assign0, (0, extra), constant_values=c0)
        n += extra
    nl = n // d

    (send_idx, loc_rows, loc_cols, loc_e2pe, loc_eattr,
     rem_rows, rem_cols, rem_e2pe, rem_eattr) = _split_edge_family(
        np.asarray(batch.edge_index[0]), np.asarray(batch.edge_index[1]),
        np.asarray(batch.edge_to_pe), np.asarray(batch.edge_attr),
        np.asarray(batch.edge_mask), nl, d, batch.pe_mask.shape[0],
    )
    (isend_idx, iloc_rows, iloc_cols, iloc_e2pie, iloc_eattr,
     irem_rows, irem_cols, irem_e2pie, irem_eattr) = _split_edge_family(
        np.asarray(batch.iedge_index[0]), np.asarray(batch.iedge_index[1]),
        np.asarray(batch.iedge_to_pie), np.asarray(batch.iedge_attr),
        np.asarray(batch.iedge_mask), nl, d, batch.pie_mask.shape[0],
    )

    from deeprank_gnn_tpu.ops.pallas.segment import sorted_window_ok

    def shard_ok(arr):
        return all(sorted_window_ok(arr[dd], nl) for dd in range(d))

    edges_sorted = bool(
        shard_ok(loc_rows) and shard_ok(rem_rows)
        and shard_ok(iloc_rows) and shard_ok(irem_rows)
        and sorted_window_ok(np.asarray(batch.pe_index[0]), c0)
        and sorted_window_ok(np.asarray(batch.pie_index[0]), c0)
    )

    # per-shard local member tables (scatter-free partial pooling):
    # common member cap across shards keeps one compiled shape
    from deeprank_gnn_tpu.data.batch import _flat_member_table

    assign_l = assign0.reshape(d, nl)
    need = 1
    for dd in range(d):
        a = assign_l[dd][assign_l[dd] < c0]
        if len(a):
            need = max(need, int(np.bincount(a).max()))
    ml = max(8, -(-need // 8) * 8)
    mem0_loc = np.stack(
        [_flat_member_table(assign_l[dd], c0, nl, ml) for dd in range(d)]
    )
    mem1_idx = (
        np.asarray(batch.mem1_idx)
        if batch.mem1_idx is not None
        else _flat_member_table(
            np.asarray(batch.assign1), batch.num_clusters1, c0
        )
    )

    return HaloBatch(
        x=x.reshape(d, nl, -1),
        assign0=assign0.reshape(d, nl),
        send_idx=send_idx,
        loc_rows=loc_rows, loc_cols=loc_cols,
        loc_e2pe=loc_e2pe, loc_eattr=loc_eattr,
        rem_rows=rem_rows, rem_cols=rem_cols,
        rem_e2pe=rem_e2pe, rem_eattr=rem_eattr,
        isend_idx=isend_idx,
        iloc_rows=iloc_rows, iloc_cols=iloc_cols,
        iloc_e2pie=iloc_e2pie, iloc_eattr=iloc_eattr,
        irem_rows=irem_rows, irem_cols=irem_cols,
        irem_e2pie=irem_e2pie, irem_eattr=irem_eattr,
        pe_index=np.asarray(batch.pe_index),
        pie_index=np.asarray(batch.pie_index),
        assign1=np.asarray(batch.assign1),
        pool1_graph=np.asarray(batch.pool1_graph),
        y=np.asarray(batch.y),
        y_mask=np.asarray(batch.y_mask),
        edges_sorted=edges_sorted,
        mem0_loc=mem0_loc,
        mem1_idx=mem1_idx,
    )


# ---------------------------------------------------------------------------
# device-side primitives (run INSIDE shard_map; axis name 'ep')


def halo_exchange(values: jax.Array, send_idx: jax.Array) -> jax.Array:
    """Exchange boundary node rows: ``values`` [Nl, F] local node data,
    ``send_idx`` [D, H] the rows each peer needs from this shard.
    Returns the combined table [Nl + D*H, F] that `rem_cols` indexes
    (halo row ``Nl + s*H + j`` = row ``send_idx[s->me][j]`` of shard s).
    """
    send = jnp.take(values, send_idx, axis=0)  # [D, H, F]
    recv = jax.lax.all_to_all(send, "ep", 0, 0, tiled=True)
    return jnp.concatenate(
        [values, recv.reshape(-1, values.shape[-1])], axis=0
    )


def _raw_segment_max(data, ids, num_segments):
    """Per-segment max with -inf empties (combinable across shards)."""
    ids = jnp.where((ids >= 0) & (ids < num_segments), ids, num_segments)
    return jax.ops.segment_max(data, ids, num_segments=num_segments + 1)[
        :num_segments
    ]


def cross_shard_max_pool(
    h: jax.Array, assign: jax.Array, num_clusters: int, mem_idx=None
):
    """Community max-pool whose clusters may span shards: local partial
    max, then one small all_gather + max (fully differentiable), with
    torch-scatter's empty-segment-0 fill applied on the GLOBAL counts.

    The member counts ride as an extra column of the SAME all_gather
    (summed post-gather where the maxes max), so the combine is one
    collective total. With a per-shard member table (``HaloBatch.
    mem0_loc``) the partial max and the counts are scatter-free flat
    gathers (`ops.dense.member_max_partial`)."""
    from deeprank_gnn_tpu.ops.segment import segment_count

    if mem_idx is not None:
        from deeprank_gnn_tpu.ops.dense import (
            member_counts,
            member_max_partial,
        )

        part = member_max_partial(h[None], mem_idx[None], assign[None])[0]
        cnt = member_counts(mem_idx, h.shape[0])
    else:
        part = _raw_segment_max(h, assign, num_clusters)
        cnt = segment_count(assign, num_clusters)
    packed = jnp.concatenate([part, cnt[:, None]], axis=1)
    ag = jax.lax.all_gather(packed, "ep")  # [D, C, F+1]
    pooled = jnp.max(ag[..., :-1], axis=0)
    gcnt = jnp.sum(ag[..., -1], axis=0)
    return jnp.where(gcnt[:, None] > 0, pooled, 0.0)


def halo_gin_aggregate(
    xw: jax.Array,
    v: HaloBatch,
    *,
    internal: bool = False,
) -> jax.Array:
    """``segment_sum(xw[col], row)`` across shards: local-source edges
    aggregate immediately (no data dependency on the exchange — XLA
    overlaps the all_to_all with this), remote-source messages add on
    halo arrival. Returns [Nl, F]."""
    from deeprank_gnn_tpu.ops.segment import gather, segment_sum

    if internal:
        send_idx, lr, lc = v.isend_idx, v.iloc_rows, v.iloc_cols
        rr, rc = v.irem_rows, v.irem_cols
    else:
        send_idx, lr, lc = v.send_idx, v.loc_rows, v.loc_cols
        rr, rc = v.rem_rows, v.rem_cols
    combined = halo_exchange(xw, send_idx)
    z = segment_sum(gather(xw, lc), lr, v.nl, sorted_ids=v.edges_sorted)
    z = z + segment_sum(
        gather(combined, rc), rr, v.nl, sorted_ids=v.edges_sorted
    )
    return z


def _joint_segment_softmax(logit_loc, rows_loc, logit_rem, rows_rem, n):
    """Per-destination softmax over edges split across the loc/rem
    groups (both groups of a row live on its owner shard, so this is
    shard-local)."""
    from deeprank_gnn_tpu.ops.segment import segment_sum

    m = jnp.maximum(
        _raw_segment_max(logit_loc, rows_loc, n),
        _raw_segment_max(logit_rem, rows_rem, n),
    )
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    mrow = jnp.concatenate([m, jnp.zeros_like(m[:1])])

    def part(logit, rows):
        safe = jnp.clip(rows, 0, n)
        e = jnp.exp(logit - mrow[safe])
        return jnp.where(rows < n, e, 0.0)

    e_loc, e_rem = part(logit_loc, rows_loc), part(logit_rem, rows_rem)
    denom = segment_sum(e_loc[:, None], rows_loc, n) + segment_sum(
        e_rem[:, None], rows_rem, n
    )
    drow = jnp.concatenate([denom[:, 0], jnp.ones(1, denom.dtype)])
    return (
        e_loc / jnp.maximum(drow[jnp.clip(rows_loc, 0, n)], 1e-16),
        e_rem / jnp.maximum(drow[jnp.clip(rows_rem, 0, n)], 1e-16),
    )


def _ginet_tower_halo(model, conv1, conv2, v: HaloBatch, internal: bool):
    """One GINet tower under the halo layout (semantics identical to
    `models.ginet.GINet._tower`; reference `ginet.py:99-141`)."""
    from deeprank_gnn_tpu.models.ginet import ginet_conv
    from deeprank_gnn_tpu.ops.pooling import graph_mean_pool, max_pool_x
    from deeprank_gnn_tpu.ops.segment import gather, segment_sum

    c0, c1, g = v.num_clusters0, v.num_clusters1, v.num_graphs
    if internal:
        lr, rr = v.iloc_rows, v.irem_rows
        le, re_ = v.iloc_eattr, v.irem_eattr
        lp, rp = v.iloc_e2pie, v.irem_e2pie
        p_index, p_cap = v.pie_index, v.pie_index.shape[1]
    else:
        lr, rr = v.loc_rows, v.rem_rows
        le, re_ = v.loc_eattr, v.rem_eattr
        lp, rp = v.loc_e2pe, v.rem_e2pe
        p_index, p_cap = v.pe_index, v.pe_index.shape[1]

    xw = v.x @ conv1.fc_w.T
    if model.attention:
        send_idx = v.isend_idx if internal else v.send_idx
        lc = v.iloc_cols if internal else v.loc_cols
        rc = v.irem_cols if internal else v.rem_cols
        combined = halo_exchange(xw, send_idx)
        msg_loc, msg_rem = gather(xw, lc), gather(combined, rc)

        def logits(msg, rows, eattr):
            xrow = gather(xw, jnp.clip(rows, 0, v.nl - 1))
            ed = eattr @ conv1.fc_edge_w.T
            lg = jnp.concatenate([xrow, msg, ed], axis=1) @ conv1.fc_att_w.T
            return jax.nn.leaky_relu(lg[:, 0])

        a_loc, a_rem = _joint_segment_softmax(
            logits(msg_loc, lr, le), lr, logits(msg_rem, rr, re_), rr, v.nl
        )
        z = segment_sum(
            msg_loc * a_loc[:, None], lr, v.nl, sorted_ids=v.edges_sorted
        ) + segment_sum(
            msg_rem * a_rem[:, None], rr, v.nl, sorted_ids=v.edges_sorted
        )
    else:
        # paper-parity (quirk Q1): pure segment-sum of W x[col]
        z = halo_gin_aggregate(xw, v, internal=internal)
    h = jax.nn.relu(z)

    hp = cross_shard_max_pool(h, v.assign0, c0, v.mem0_loc)  # replicated from here on
    # pooled coalesced edge attrs (torch-sparse coalesce attr-sum):
    # per-shard partials psum to the replicated pooled table — only the
    # attention mode reads them (paper mode ignores edge attrs, Q1)
    pa = None
    if model.attention:
        pa = jax.lax.psum(
            segment_sum(le, lp, p_cap) + segment_sum(re_, rp, p_cap), "ep"
        )
    h2 = jax.nn.relu(
        ginet_conv(
            conv2, hp, p_index, pa, c0,
            attention=model.attention, sorted_rows=v.edges_sorted,
        )
    )
    hq = max_pool_x(h2, v.assign1, c1, v.mem1_idx)
    return graph_mean_pool(hq, v.pool1_graph, g)


def _halo_segment_mean_pair(msg_loc, lr, msg_rem, rr, n, sorted_ids):
    """Joint segment-mean over an edge family split into local/remote
    groups (count-clamped empty-segment-0 semantics of
    `ops.segment.segment_mean`)."""
    from deeprank_gnn_tpu.ops.segment import segment_count, segment_sum

    total = segment_sum(msg_loc, lr, n, sorted_ids=sorted_ids) + segment_sum(
        msg_rem, rr, n, sorted_ids=sorted_ids
    )
    cnt = segment_count(lr, n) + segment_count(rr, n)
    return total / jnp.maximum(cnt[:, None], 1.0)


def fout_apply_halo(model, params, v: HaloBatch):
    """FoutNet forward on a local halo view (reference
    `foutnet.py:90-126`; neighbor-mean via the boundary exchange)."""
    from deeprank_gnn_tpu.models.common import linear
    from deeprank_gnn_tpu.models.foutnet import fout_layer
    from deeprank_gnn_tpu.ops.pooling import graph_mean_pool, max_pool_x
    from deeprank_gnn_tpu.ops.segment import gather

    c0, c1, g = v.num_clusters0, v.num_clusters1, v.num_graphs
    p = params.conv1
    alpha = v.x @ p.wc
    beta = v.x @ p.wn
    combined = halo_exchange(beta, v.send_idx)
    gamma = _halo_segment_mean_pair(
        gather(beta, v.loc_cols), v.loc_rows,
        gather(combined, v.rem_cols), v.rem_rows,
        v.nl, v.edges_sorted,
    )
    h = jax.nn.relu(alpha + gamma + p.bias)
    hp = cross_shard_max_pool(h, v.assign0, c0, v.mem0_loc)
    h2 = jax.nn.relu(
        fout_layer(params.conv2, hp, v.pe_index, c0,
                   sorted_rows=v.edges_sorted)
    )
    hq = max_pool_x(h2, v.assign1, c1, v.mem1_idx)
    out = graph_mean_pool(hq, v.pool1_graph, g)
    out = jax.nn.relu(linear(out, params.fc1_w, params.fc1_b))
    return linear(out, params.fc2_w, params.fc2_b)


def sgat_apply_halo(model, params, v: HaloBatch):
    """sGAT forward on a local halo view (reference `sGAT.py:101-139`;
    undirected mode — the networks' only wiring, quirk Q10)."""
    from deeprank_gnn_tpu.models.common import linear
    from deeprank_gnn_tpu.models.sgat import sgat_layer
    from deeprank_gnn_tpu.ops.pooling import graph_mean_pool, max_pool_x
    from deeprank_gnn_tpu.ops.segment import gather, segment_sum

    c0, c1, g = v.num_clusters0, v.num_clusters1, v.num_graphs
    p = params.conv1
    in_ch = v.x.shape[1]
    xr = v.x @ p.weight[:in_ch]
    xc = v.x @ p.weight[in_ch:]
    combined = halo_exchange(xc, v.send_idx)
    a_loc = (
        gather(xr, jnp.clip(v.loc_rows, 0, v.nl - 1))
        + gather(xc, v.loc_cols)
    ) * v.loc_eattr
    a_rem = (
        gather(xr, jnp.clip(v.rem_rows, 0, v.nl - 1))
        + gather(combined, v.rem_cols)
    ) * v.rem_eattr
    h = _halo_segment_mean_pair(
        a_loc, v.loc_rows, a_rem, v.rem_rows, v.nl, v.edges_sorted
    ) + p.bias
    h = jax.nn.relu(h)
    hp = cross_shard_max_pool(h, v.assign0, c0, v.mem0_loc)
    p_cap = v.pe_index.shape[1]
    pe_attr = jax.lax.psum(
        segment_sum(v.loc_eattr, v.loc_e2pe, p_cap)
        + segment_sum(v.rem_eattr, v.rem_e2pe, p_cap),
        "ep",
    )
    h2 = jax.nn.relu(
        sgat_layer(params.conv2, hp, v.pe_index, pe_attr, c0,
                   sorted_rows=v.edges_sorted)
    )
    hq = max_pool_x(h2, v.assign1, c1, v.mem1_idx)
    out = graph_mean_pool(hq, v.pool1_graph, g)
    out = jax.nn.relu(linear(out, params.fc1_w, params.fc1_b))
    return linear(out, params.fc2_w, params.fc2_b)


def _ginet_towers_halo_fused(params, v: HaloBatch) -> jax.Array:
    """Paper-mode (quirk Q1/Q2) GINet towers, fused: both towers run on
    the interface edges with independent weights, so their features
    concatenate and the whole forward costs exactly TWO collectives —
    one boundary all_to_all (both towers' 16-wide messages in one
    32-wide exchange) and one pooled-combine all_gather. Wider segment
    ops also use the MXU better than two 16-wide passes. Returns the
    concatenated [G, 64] tower readout."""
    from deeprank_gnn_tpu.ops.pooling import graph_mean_pool, max_pool_x
    from deeprank_gnn_tpu.ops.segment import gather, segment_sum

    c0, c1, g = v.num_clusters0, v.num_clusters1, v.num_graphs
    xw = jnp.concatenate(
        [v.x @ params.conv1.fc_w.T, v.x @ params.conv1_ext.fc_w.T], axis=1
    )  # [Nl, 32]
    h = jax.nn.relu(halo_gin_aggregate(xw, v))
    hp = cross_shard_max_pool(h, v.assign0, c0, v.mem0_loc)  # [C0, 32] replicated
    hw = jnp.concatenate(
        [hp[:, :16] @ params.conv2.fc_w.T, hp[:, 16:] @ params.conv2_ext.fc_w.T],
        axis=1,
    )  # [C0, 64]
    row, col = v.pe_index[0], v.pe_index[1]
    h2 = jax.nn.relu(
        segment_sum(gather(hw, col), row, c0, sorted_ids=v.edges_sorted)
    )
    hq = max_pool_x(h2, v.assign1, c1, v.mem1_idx)
    return graph_mean_pool(hq, v.pool1_graph, g)  # [G, 64] = [t1 | t2]


def ginet_apply_halo(model, params, v: HaloBatch, *, training, rng):
    """GINet forward on a local halo view (called inside shard_map)."""
    from deeprank_gnn_tpu.models.common import dropout, linear

    if model.attention or model.internal_tower:
        t1 = _ginet_tower_halo(model, params.conv1, params.conv2, v, False)
        t2 = _ginet_tower_halo(
            model, params.conv1_ext, params.conv2_ext, v,
            internal=model.internal_tower,
        )
        h = jnp.concatenate([t1, t2], axis=1)
    else:
        h = _ginet_towers_halo_fused(params, v)
    h = jax.nn.relu(linear(h, params.fc1_w, params.fc1_b))
    h = dropout(h, model.dropout_rate, rng, training)
    return linear(h, params.fc2_w, params.fc2_b)


# ---------------------------------------------------------------------------
# step builders


def _shard_mapped_loss(model, mesh, task, class_weights, transform_sigmoid):
    from deeprank_gnn_tpu.train.losses import cross_entropy_loss, mse_loss

    def loss_core(params, hb, key, training):
        v = hb.local()
        pred = model.apply(params, v, training=training, rng=key)
        if task == "class":
            loss = cross_entropy_loss(
                pred, hb.y.astype(jnp.int32), hb.y_mask, class_weights
            )
        else:
            p = pred.reshape(-1)
            if transform_sigmoid:
                p = jax.nn.sigmoid(p)
            pred = p
            loss = mse_loss(pred, hb.y, hb.y_mask)
        return loss, pred

    def wrapped(params, hb, key, training):
        return _shard_map(
            lambda p, b, k: loss_core(p, b, k, training),
            mesh=mesh,
            in_specs=(P(), halo_specs(hb), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(params, hb, key)

    return wrapped


def make_halo_train_step(
    model,
    optimizer,
    mesh: Mesh,
    task: str = "reg",
    class_weights: Optional[jax.Array] = None,
    transform_sigmoid: bool = False,
):
    """Jitted `(params, opt_state, halo_batch, rng) -> (params,
    opt_state, loss, pred, rng)` with the explicit halo-exchange
    forward/backward; gradients reduce via the shard_map transpose."""
    loss_wrapped = _shard_mapped_loss(
        model, mesh, task, class_weights, transform_sigmoid
    )

    def step(params, opt_state, hb, rng):
        rng, key = jax.random.split(rng)
        (loss, pred), grads = jax.value_and_grad(
            lambda p: loss_wrapped(p, hb, key, True), has_aux=True
        )(params)
        import optax

        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, pred, rng

    replicated = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(replicated, replicated, None, replicated),
        out_shardings=(replicated,) * 5,
    )


def make_halo_eval_step(
    model,
    mesh: Mesh,
    task: str = "reg",
    class_weights: Optional[jax.Array] = None,
    transform_sigmoid: bool = False,
):
    loss_wrapped = _shard_mapped_loss(
        model, mesh, task, class_weights, transform_sigmoid
    )

    def eval_step(params, hb):
        # dropout is off at eval; the key is a dummy so the shard_map
        # arg tree stays uniform
        return loss_wrapped(params, hb, jax.random.PRNGKey(0), False)

    replicated = NamedSharding(mesh, P())
    return jax.jit(
        eval_step,
        in_shardings=(replicated, None),
        out_shardings=(replicated, replicated),
    )


__all__ = [
    "HaloBatch",
    "make_halo_mesh",
    "partition_batch",
    "halo_specs",
    "shard_halo_batch",
    "halo_exchange",
    "halo_gin_aggregate",
    "cross_shard_max_pool",
    "ginet_apply_halo",
    "make_halo_train_step",
    "make_halo_eval_step",
]
