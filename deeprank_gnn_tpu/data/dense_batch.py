"""Dense per-graph batch layout: message passing as batched MXU GEMMs.

The sparse `GraphBatch` concatenates graphs into flat padded arrays and
aggregates with segment scatters. Residue interface graphs are SMALL
(~100-200 nodes) while batches are large (128+ graphs) — the ideal
shape for TPU is therefore [G, Eg, ...] / [G, Ng, ...] with every graph
padded to a uniform per-graph capacity: neighborhood aggregation
becomes a batched one-hot matmul on the MXU (einsum over the edge
axis), and community pooling a masked max over a [Cg, Ng] assignment
mask — no scatter anywhere in the training step.

Semantics are identical to the sparse path (same conv math, same
max/mean pooling, duplicate-edge coalescing precomputed on host); the
golden tests assert dense == sparse.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax

from deeprank_gnn_tpu.data.dataset import GraphSample


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DenseGraphBatch:
    """Per-graph uniform padded batch. Sentinel index = capacity."""

    x: jax.Array  # [G, Ng, F]
    node_mask: jax.Array  # [G, Ng] bool
    row: jax.Array  # [G, Eg] int32, pad -> Ng
    col: jax.Array  # [G, Eg] int32, pad -> Ng
    edge_attr: jax.Array  # [G, Eg, Fe]
    edge_mask: jax.Array  # [G, Eg] bool

    assign0: jax.Array  # [G, Ng] int32 cluster id, pad -> C0g
    pool0_mask: jax.Array  # [G, C0g] bool
    edge_to_pe: jax.Array  # [G, Eg] int32 pooled-edge slot, pad -> Pg
    pe_row: jax.Array  # [G, Pg] int32, pad -> C0g
    pe_col: jax.Array  # [G, Pg] int32, pad -> C0g
    pe_mask: jax.Array  # [G, Pg] bool
    assign1: jax.Array  # [G, C0g] int32, pad -> C1g
    pool1_mask: jax.Array  # [G, C1g] bool

    y: jax.Array  # [G]
    y_mask: jax.Array  # [G]

    # Precomputed aggregation operators (collate_dense(precompute_ops=
    # True); None on the plain streaming path). Message passing is a
    # linear operator on node features that depends only on the batch
    # structure, so its action precomputes once per graph and the step
    # runs plain MXU matmuls (see `ops.dense.adj_conv`):
    agg_x: Optional[jax.Array] = None  # [G, Ng, F] = P0 @ x
    deg0: Optional[jax.Array] = None  # [G, Ng] in-degree (row counts)
    adj1: Optional[jax.Array] = None  # [G, C0g, C0g] pooled-edge P1
    # edge-ATTRIBUTE-weighted operators (sGAT; built when the batch has
    # exactly one edge feature — sGAT's weighting broadcast requires it)
    wagg_x: Optional[jax.Array] = None  # [G, Ng, F] = A_w @ x
    ea_rowsum0: Optional[jax.Array] = None  # [G, Ng] sum of ea by row
    wadj1: Optional[jax.Array] = None  # [G, C0g, C0g] pe_attr-weighted P1
    ea_rowsum1: Optional[jax.Array] = None  # [G, C0g] sum of pe_attr by row
    # cluster member tables (precompute_ops): node/cluster indices per
    # pooling slot, so max-pooling is a gather over at most M members
    # instead of a [C, S] broadcast — the difference between O(C*M) and
    # O(C*S) work per pool at atomic-graph scale (`ops.dense.
    # member_max_pool`). Pad sentinel = source capacity (Ng / C0g).
    mem0_idx: Optional[jax.Array] = None  # [G, C0g, M0] int32, pad -> Ng
    mem1_idx: Optional[jax.Array] = None  # [G, C1g, M1] int32, pad -> C0g
    # feature-major + tiled-pooling fields (cluster_sort run-padded
    # layout, precompute_ops; see collate_dense docstring). STRIPED
    # 4-D: member-slot r of tile t holds node Ng = t*8 + r, so tiles
    # ride the (128-padded) lane axis and tile reductions/broadcasts
    # are axis-2 ops (`ops.dense.tiled_cluster_max_pool`).
    agg_x_fm: Optional[jax.Array] = None  # [G, F, 8, T] = P0 @ x striped
    node_mask_fm: Optional[jax.Array] = None  # [G, 8, T] bool
    tile_mem0: Optional[jax.Array] = None  # [G, C0g, MT] int32, pad -> T
    tile_assign0: Optional[jax.Array] = None  # [G, T] int32, pad -> C0g

    @property
    def num_graphs(self) -> int:
        return self.x.shape[0]

    @property
    def nodes_per_graph(self) -> int:
        return self.x.shape[1]


def _round_up(n: int, mult: int) -> int:
    return ((n + mult - 1) // mult) * mult if mult > 1 else max(n, 1)


def collate_dense(
    graphs: Sequence[GraphSample],
    *,
    ng: Optional[int] = None,
    eg: Optional[int] = None,
    pg: Optional[int] = None,
    c0g: Optional[int] = None,
    c1g: Optional[int] = None,
    m0g: Optional[int] = None,
    m1g: Optional[int] = None,
    mt0g: Optional[int] = None,
    g_pad: Optional[int] = None,
    node_mult: int = 8,
    edge_mult: int = 128,
    plans=None,
    num_features: Optional[int] = None,
    num_edge_features: Optional[int] = None,
    precompute_ops: bool = False,
    cluster_sort: bool = True,
) -> Tuple[DenseGraphBatch, List[str]]:
    """Collate graphs into a DenseGraphBatch (host-side numpy).

    ``plans``: precomputed per-graph :class:`data.batch.GraphPlan`
    objects (the same cluster renumbering + pooled-edge coalescing the
    sparse path uses) — the loader caches them across epochs.

    ``cluster_sort``: renumber each graph's nodes so level-0 cluster
    members are CONTIGUOUS and each cluster's run is PADDED to a
    multiple of 8 (`ops.dense.TILE_R`, the fp32 sublane tile). Same
    semantics (every per-graph op is permutation-equivariant, pooling/
    readout are order-invariant; pad slots are masked), applied to
    every dense collate so streaming and device-cached batches stay
    bit-identical. With ``precompute_ops`` the run-padded layout
    additionally carries:

    - ``agg_x_fm`` [G, F, 8, T]: the aggregation action stored STRIPED
      FEATURE-MAJOR (member slot r of tile t holds node 8t+r). XLA's
      TPU tiled layout pads the minor axis to the 128-lane tile, so
      node-major [G, Np, F<=64] arrays physically move 2-8x their
      logical bytes; the striped shape puts tiles on the (128-padded)
      lane axis and features on sublanes — no padding, and within-tile
      reductions / tile broadcasts are cheap axis-2 ops (measured ~4x
      on the at-scale fwd+bwd towers). ``node_mask_fm`` [G, 8, T] is
      the striped validity mask.
    - ``tile_mem0`` [G, C0, MT] / ``tile_assign0`` [G, T]: cluster
      pooling becomes an axis-2 tile max + a TILE-level member gather
      (T = Np/8 rows instead of C*M node rows) —
      `ops.dense.tiled_cluster_max_pool` (custom even-tie-split VJP).

    The run padding inflates node capacity by at most (8-1)/mean
    cluster size (~2x on 4-node synthetic clusters, ~1.1x on real
    featurizer communities); every downstream op is mask-correct, and
    the MXU/HBM savings above dominate at scale.

    ``graphs`` may be empty when every capacity plus ``g_pad``,
    ``num_features`` and ``num_edge_features`` are given explicitly —
    a multi-host process whose slice of the final partial global batch
    holds no real graphs still has to contribute an all-padding shard.
    """
    from deeprank_gnn_tpu.data.batch import make_graph_plan

    if not graphs and not (
        g_pad and ng and eg and pg and c0g and c1g
        and num_features and num_edge_features
    ):
        raise ValueError("empty batch")
    g_real = len(graphs)
    g = g_pad or g_real
    f = num_features or graphs[0].num_features
    fe = num_edge_features or graphs[0].edge_attr.shape[1]

    from deeprank_gnn_tpu.ops.dense import TILE_R

    if plans is None:
        plans = [make_graph_plan(s) for s in graphs]

    hist0 = None
    if cluster_sort and graphs:
        # per-graph cluster histograms; node capacity covers the
        # run-padded layout (each cluster padded to a TILE_R multiple)
        hist0 = [
            np.bincount(p.cluster0, minlength=max(p.k0, 1)) for p in plans
        ]
        padded_sizes = [
            int((-(-h // TILE_R) * TILE_R).sum()) for h in hist0
        ]
    if graphs:
        if cluster_sort:
            ng = ng or _round_up(
                max(padded_sizes), max(node_mult, TILE_R)
            )
        else:
            ng = ng or _round_up(max(s.num_nodes for s in graphs), node_mult)
        eg = eg or _round_up(
            max(s.edge_index.shape[1] for s in graphs), edge_mult
        )
        pg = pg or _round_up(max(p.pe_uniq.shape[0] for p in plans), edge_mult)
        c0g = c0g or _round_up(max(p.k0 for p in plans), node_mult)
        c1g = c1g or _round_up(max(p.k1 for p in plans), node_mult)
    if precompute_ops:
        if graphs:
            m0g = m0g or _round_up(
                max(
                    int(np.bincount(p.cluster0, minlength=1).max())
                    for p in plans
                ),
                8,
            )
            m1g = m1g or _round_up(
                max(
                    int(np.bincount(p.cluster1, minlength=1).max())
                    for p in plans
                ),
                8,
            )
        else:
            m0g = m0g or 8
            m1g = m1g or 8

    x = np.zeros((g, ng, f), dtype=np.float32)
    node_mask = np.zeros((g, ng), dtype=bool)
    row = np.full((g, eg), ng, dtype=np.int32)
    col = np.full((g, eg), ng, dtype=np.int32)
    edge_attr = np.zeros((g, eg, fe), dtype=np.float32)
    edge_mask = np.zeros((g, eg), dtype=bool)
    assign0 = np.full((g, ng), c0g, dtype=np.int32)
    pool0_mask = np.zeros((g, c0g), dtype=bool)
    edge_to_pe = np.full((g, eg), pg, dtype=np.int32)
    pe_row = np.full((g, pg), c0g, dtype=np.int32)
    pe_col = np.full((g, pg), c0g, dtype=np.int32)
    pe_mask = np.zeros((g, pg), dtype=bool)
    assign1 = np.full((g, c0g), c1g, dtype=np.int32)
    pool1_mask = np.zeros((g, c1g), dtype=bool)
    y = np.zeros(g, dtype=np.float32)
    y_mask = np.zeros(g, dtype=bool)
    mols: List[str] = []
    agg_x = deg0 = adj1 = None
    wagg_x = ea_rowsum0 = wadj1 = ea_rowsum1 = None
    mem0_idx = mem1_idx = None
    tile_mem0 = tile_assign0 = None
    if precompute_ops:
        import ml_dtypes

        agg_x = np.zeros((g, ng, f), dtype=np.float32)
        deg0 = np.zeros((g, ng), dtype=np.float32)
        # adj1 entries are exactly 0/1 (coalesced-unique pooled pairs),
        # so bf16 is lossless — and adj1 is the step's largest read at
        # atomic scale ([G, C0, C0]; adj_conv consumes bf16 anyway, so
        # storing f32 doubled the dominant HBM traffic for nothing)
        adj1 = np.zeros((g, c0g, c0g), dtype=ml_dtypes.bfloat16)
        mem0_idx = np.full((g, c0g, m0g), ng, dtype=np.int32)
        mem1_idx = np.full((g, c1g, m1g), c0g, dtype=np.int32)
        if cluster_sort:
            t_cap = ng // TILE_R
            if mt0g is None:
                mt0g = max(
                    (
                        max(
                            int((-(-h // TILE_R)).max()) if h.size else 1
                            for h in hist0
                        )
                        if hist0
                        else 1
                    ),
                    1,
                )
            tile_mem0 = np.full((g, c0g, mt0g), t_cap, dtype=np.int32)
            tile_assign0 = np.full((g, t_cap), c0g, dtype=np.int32)
        if fe == 1:
            wagg_x = np.zeros((g, ng, f), dtype=np.float32)
            ea_rowsum0 = np.zeros((g, ng), dtype=np.float32)
            wadj1 = np.zeros((g, c0g, c0g), dtype=np.float32)
            ea_rowsum1 = np.zeros((g, c0g), dtype=np.float32)

    for gi, s in enumerate(graphs):
        n, e = s.num_nodes, s.edge_index.shape[1]
        plan = plans[gi]
        k0, k1 = plan.k0, plan.k1
        if n > ng or e > eg or k0 > c0g or k1 > c1g:
            raise ValueError(f"graph {s.mol} exceeds dense capacities")
        if cluster_sort:
            # run-padded layout: cluster c occupies the contiguous row
            # run [off[c], off[c] + pad8(len_c)); pos maps old node ids
            # to their run slots (stable order within a cluster)
            lens = hist0[gi]
            padded = -(-lens // TILE_R) * TILE_R
            if int(padded.sum()) > ng:
                raise ValueError(
                    f"graph {s.mol} exceeds run-padded node capacity"
                )
            off = np.zeros(len(lens) + 1, dtype=np.int64)
            off[1:] = np.cumsum(padded)
            srt = np.argsort(plan.cluster0, kind="stable")
            ids_sorted = plan.cluster0[srt]
            starts = np.searchsorted(ids_sorted, ids_sorted, "left")
            rank_sorted = np.arange(n) - starts
            pos = np.empty(n, dtype=np.int64)
            pos[srt] = off[ids_sorted] + rank_sorted
            srow = pos[s.edge_index[0]].astype(np.int32)
            scol = pos[s.edge_index[1]].astype(np.int32)
            x[gi, pos] = s.x
            node_mask[gi, pos] = True
            assign0[gi, pos] = plan.cluster0
        else:
            pos = np.arange(n, dtype=np.int64)
            srow, scol = s.edge_index[0], s.edge_index[1]
            x[gi, :n] = s.x
            node_mask[gi, :n] = True
            assign0[gi, :n] = plan.cluster0
        row[gi, :e] = srow
        col[gi, :e] = scol
        edge_attr[gi, :e] = s.edge_attr
        edge_mask[gi, :e] = True
        pool0_mask[gi, :k0] = True
        p = plan.pe_uniq.shape[0]
        edge_to_pe[gi, :e][plan.pe_keep] = plan.pe_inv
        pe_row[gi, :p] = plan.pe_uniq[:, 0]
        pe_col[gi, :p] = plan.pe_uniq[:, 1]
        pe_mask[gi, :p] = True
        assign1[gi, :k0] = plan.cluster1
        pool1_mask[gi, :k1] = True
        if s.y is not None:
            y[gi] = s.y
            y_mask[gi] = True
        if precompute_ops:
            # cluster member tables: node ids per level-0 cluster,
            # level-0-cluster ids per level-1 cluster (stable file
            # order within each cluster)
            for assign, values, mem, cap in (
                (plan.cluster0, pos, mem0_idx[gi], m0g),
                (plan.cluster1, None, mem1_idx[gi], m1g),
            ):
                order = np.argsort(assign, kind="stable")
                sorted_ids = assign[order]
                # rank of each member within its cluster
                starts = np.searchsorted(sorted_ids, sorted_ids, "left")
                rank = np.arange(len(order)) - starts
                if len(rank) and rank.max() >= cap:
                    raise ValueError(
                        f"graph {s.mol} exceeds member capacity {cap}"
                    )
                # member ids in BATCH-LAYOUT space (run-padded slots
                # for nodes, identity for cluster levels)
                mem[sorted_ids, rank] = (
                    values[order] if values is not None else order
                )
            if tile_mem0 is not None:
                # tile tables: cluster c owns the contiguous tile run
                # [off[c]/R, (off[c]+pad8(len_c))/R)
                lens = hist0[gi]
                padded = -(-lens // TILE_R) * TILE_R
                nt = padded // TILE_R
                tot = int(nt.sum())
                tstart = np.zeros(len(nt) + 1, dtype=np.int64)
                tstart[1:] = np.cumsum(nt)
                tile_ids = np.arange(tot, dtype=np.int64)
                cl_of = np.repeat(np.arange(len(nt)), nt)
                rank_t = tile_ids - tstart[cl_of]
                tile_mem0[gi][cl_of, rank_t] = tile_ids
                tile_assign0[gi, :tot] = cl_of
            # level-0 sum-aggregation action on the raw features
            # (exact fp32 — matches segment_sum semantics incl.
            # duplicate-edge multiplicity) + in-degrees; level-1 pooled
            # adjacency operator (pe pairs are coalesced-unique)
            np.add.at(agg_x[gi], srow, s.x[s.edge_index[1]])
            deg0[gi, :] += np.bincount(
                srow, minlength=ng
            )[:ng].astype(np.float32)
            p_uniq = plan.pe_uniq
            adj1[gi][p_uniq[:, 0], p_uniq[:, 1]] = 1.0
            if wagg_x is not None:
                ea = s.edge_attr[:, 0].astype(np.float32)
                np.add.at(
                    wagg_x[gi], srow,
                    ea[:, None] * s.x[s.edge_index[1]],
                )
                np.add.at(ea_rowsum0[gi], srow, ea)
                # pe_attr = coalesced (summed) edge attrs per unique
                # pooled pair — torch-sparse coalesce semantics
                pe_attr = np.zeros(p_uniq.shape[0], dtype=np.float32)
                np.add.at(pe_attr, plan.pe_inv, ea[plan.pe_keep])
                wadj1[gi][p_uniq[:, 0], p_uniq[:, 1]] = pe_attr
                np.add.at(ea_rowsum1[gi], p_uniq[:, 0], pe_attr)
        mols.append(s.mol)

    # striped feature-major action + mask: the level-1 conv + tiled
    # pool never touch a node-major array (see docstring)
    agg_x_fm = node_mask_fm = None
    if agg_x is not None and tile_mem0 is not None:
        t_cap = ng // TILE_R
        agg_x_fm = np.ascontiguousarray(
            agg_x.reshape(g, t_cap, TILE_R, f).transpose(0, 3, 2, 1)
        )
        node_mask_fm = np.ascontiguousarray(
            node_mask.reshape(g, t_cap, TILE_R).transpose(0, 2, 1)
        )

    batch = DenseGraphBatch(
        x=x,
        node_mask=node_mask,
        row=row,
        col=col,
        edge_attr=edge_attr,
        edge_mask=edge_mask,
        assign0=assign0,
        pool0_mask=pool0_mask,
        edge_to_pe=edge_to_pe,
        pe_row=pe_row,
        pe_col=pe_col,
        pe_mask=pe_mask,
        assign1=assign1,
        pool1_mask=pool1_mask,
        y=y,
        y_mask=y_mask,
        agg_x=agg_x,
        deg0=deg0,
        adj1=adj1,
        wagg_x=wagg_x,
        ea_rowsum0=ea_rowsum0,
        wadj1=wadj1,
        ea_rowsum1=ea_rowsum1,
        mem0_idx=mem0_idx,
        mem1_idx=mem1_idx,
        agg_x_fm=agg_x_fm,
        node_mask_fm=node_mask_fm,
        tile_mem0=tile_mem0,
        tile_assign0=tile_assign0,
    )
    return batch, mols
