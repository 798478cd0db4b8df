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
    members are CONTIGUOUS. The member tables (``precompute_ops``) then
    index runs of consecutive rows, turning the pooling gathers of
    `ops.dense.member_max_pool` from random row access into sequential
    streams (and the backward's ``out[assign]`` gather into a sorted
    one) — same semantics (every per-graph op is permutation-
    equivariant and pooling/readout are order-invariant), measurably
    faster at atomic-graph scale where the pool is HBM-bound. Applied
    to every dense collate (not just operator-precomputing ones) so
    streaming and device-cached batches stay bit-identical.

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

    if plans is None:
        plans = [make_graph_plan(s) for s in graphs]

    if graphs:
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
            # new_pos -> old node index; inv: old -> new
            perm = np.argsort(plan.cluster0, kind="stable")
            inv = np.empty(n, dtype=np.int64)
            inv[perm] = np.arange(n)
            sx = s.x[perm]
            srow = inv[s.edge_index[0]].astype(np.int32)
            scol = inv[s.edge_index[1]].astype(np.int32)
            scluster0 = plan.cluster0[perm]
        else:
            sx = s.x
            srow, scol = s.edge_index[0], s.edge_index[1]
            scluster0 = plan.cluster0
        x[gi, :n] = sx
        node_mask[gi, :n] = True
        row[gi, :e] = srow
        col[gi, :e] = scol
        edge_attr[gi, :e] = s.edge_attr
        edge_mask[gi, :e] = True
        assign0[gi, :n] = scluster0
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
            for assign, mem, cap in (
                (scluster0, mem0_idx[gi], m0g),
                (plan.cluster1, mem1_idx[gi], m1g),
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
                mem[sorted_ids, rank] = order
            # level-0 sum-aggregation action on the raw features
            # (exact fp32 — matches segment_sum semantics incl.
            # duplicate-edge multiplicity) + in-degrees; level-1 pooled
            # adjacency operator (pe pairs are coalesced-unique)
            np.add.at(agg_x[gi], srow, s.x[s.edge_index[1]])
            deg0[gi, :n] = np.bincount(
                srow, minlength=n
            )[:n].astype(np.float32)
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
    )
    return batch, mols
