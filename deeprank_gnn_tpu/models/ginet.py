"""GINet: edge-gated two-tower hierarchical GNN (reference `ginet.py`).

Semantics reproduced exactly, including the two behavioral quirks:

- **Q1** (reference `ginet.py:66`): the attention logit is softmaxed
  over a size-1 axis, so the attention weight is identically 1.0 *and*
  its Jacobian is identically 0 — the fc_attention / fc_edge_attr
  branch is dead in both forward and backward. The conv therefore
  reduces to ``z = segment_sum((x @ W.T)[col], row)``; we skip the dead
  compute (the parameters still exist in the pytree, receive zero
  gradient under torch autograd and are simply never touched here —
  bitwise the same training trajectory).
- **Q2** (reference `ginet.py:101,118-130`): BOTH towers run on the
  *interface* edges (`data_ext = data.clone()`), not internal edges.
  Internal edges influence the model only through offline clustering.

Set ``attention=True`` for the "fixed" non-paper mode that actually
applies per-neighborhood segment-softmax attention.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from deeprank_gnn_tpu.data.batch import GraphBatch
from deeprank_gnn_tpu.models.common import (
    dropout,
    linear,
    linear_init,
    uniform_init,
)
from deeprank_gnn_tpu.ops.segment import (
    gather,
    segment_mean,
    segment_softmax,
    segment_sum,
)
from deeprank_gnn_tpu.ops.pooling import (
    community_pooling_x,
    graph_mean_pool,
    max_pool_x,
)


@jax.tree_util.register_dataclass
@dataclass
class GINetConvParams:
    fc_w: jax.Array  # [out, in]
    fc_edge_w: jax.Array  # [fe, fe]
    fc_att_w: jax.Array  # [1, 2*out + fe]


@jax.tree_util.register_dataclass
@dataclass
class GINetParams:
    conv1: GINetConvParams
    conv2: GINetConvParams
    conv1_ext: GINetConvParams
    conv2_ext: GINetConvParams
    fc1_w: jax.Array
    fc1_b: jax.Array
    fc2_w: jax.Array
    fc2_b: jax.Array


def _conv_init(rng, in_ch: int, out_ch: int, fe: int) -> GINetConvParams:
    k1, k2, k3 = jax.random.split(rng, 3)
    # the reference seeds every conv tensor with uniform(size=in_channels)
    # (reference `ginet.py:43-48`)
    return GINetConvParams(
        fc_w=uniform_init(k1, (out_ch, in_ch), in_ch),
        fc_edge_w=uniform_init(k2, (fe, fe), in_ch),
        fc_att_w=uniform_init(k3, (1, 2 * out_ch + fe), in_ch),
    )


def ginet_conv(
    params: GINetConvParams,
    x: jax.Array,
    edge_index: jax.Array,
    edge_attr: jax.Array,
    num_nodes: int,
    *,
    attention: bool = False,
    sorted_rows: bool = False,
) -> jax.Array:
    """One GINet conv layer (reference `ginet.py:50-73`).

    Paper-parity mode (attention=False): per quirk Q1 the softmaxed
    attention is constant 1 with zero gradient, so the layer is exactly
    ``segment_sum(W x[col], row)``.
    """
    row, col = edge_index[0], edge_index[1]
    xw = x @ params.fc_w.T  # one GEMM over nodes; MXU-friendly
    msg = gather(xw, col)
    if attention:
        xrow = gather(xw, row)
        ed = edge_attr @ params.fc_edge_w.T
        logits = jnp.concatenate([xrow, msg, ed], axis=1) @ params.fc_att_w.T
        logits = jax.nn.leaky_relu(logits)
        alpha = segment_softmax(logits[:, 0], row, num_nodes)
        msg = msg * alpha[:, None]
    return segment_sum(msg, row, num_nodes, sorted_ids=sorted_rows)


class GINet:
    """Two-tower hierarchical GINet (reference `ginet.py:81-141`)."""

    dropout_rate = 0.4  # reference `ginet.py:97`

    def __init__(
        self,
        input_shape: int,
        output_shape: int = 1,
        input_shape_edge: int = 1,
        attention: bool = False,
        internal_tower: bool = False,
    ):
        """``internal_tower=True`` wires the second tower to the
        *internal* (intra-protein) edges — the architecture the
        reference documents (`docs/tutorial.advanced.rst:127-138`) but
        never ships (its code runs both towers on interface edges,
        quirk Q2). Default False = shipped-code parity."""
        self.input_shape = input_shape
        self.output_shape = output_shape
        self.input_shape_edge = input_shape_edge
        self.attention = attention
        self.internal_tower = internal_tower

    def init(self, rng: jax.Array) -> GINetParams:
        ks = jax.random.split(rng, 6)
        fe = self.input_shape_edge
        fc1_w, fc1_b = linear_init(ks[4], 64, 128)
        fc2_w, fc2_b = linear_init(ks[5], 128, self.output_shape)
        return GINetParams(
            conv1=_conv_init(ks[0], self.input_shape, 16, fe),
            conv2=_conv_init(ks[1], 16, 32, fe),
            conv1_ext=_conv_init(ks[2], self.input_shape, 16, fe),
            conv2_ext=_conv_init(ks[3], 16, 32, fe),
            fc1_w=fc1_w,
            fc1_b=fc1_b,
            fc2_w=fc2_w,
            fc2_b=fc2_b,
        )

    def _tower(
        self,
        conv1: GINetConvParams,
        conv2: GINetConvParams,
        batch: GraphBatch,
        *,
        internal: bool = False,
    ) -> jax.Array:
        n, c0, c1 = batch.num_nodes, batch.num_clusters0, batch.num_clusters1
        g = batch.num_graphs
        if internal:
            edge_index, edge_attr = batch.iedge_index, batch.iedge_attr
            edge_to_pooled, pooled_index = batch.iedge_to_pie, batch.pie_index
            pooled_cap = batch.pie_mask.shape[0]
        else:
            # Q2 parity: the shipped reference runs BOTH towers here
            edge_index, edge_attr = batch.edge_index, batch.edge_attr
            edge_to_pooled, pooled_index = batch.edge_to_pe, batch.pe_index
            pooled_cap = batch.pe_mask.shape[0]
        h = jax.nn.relu(
            ginet_conv(
                conv1, batch.x, edge_index, edge_attr, n,
                attention=self.attention, sorted_rows=batch.edges_sorted,
            )
        )
        # community pooling: max over cluster members
        hp = community_pooling_x(h, batch.assign0, c0, batch.mem0_idx)
        # pooled coalesced edge attrs: duplicate edges attr-summed
        # (torch-sparse coalesce semantics, reference
        # `community_pooling.py:204-205`)
        pooled_attr = segment_sum(edge_attr, edge_to_pooled, pooled_cap)
        h2 = jax.nn.relu(
            ginet_conv(
                conv2, hp, pooled_index, pooled_attr, c0,
                attention=self.attention, sorted_rows=batch.edges_sorted,
            )
        )
        hq = max_pool_x(h2, batch.assign1, c1, batch.mem1_idx)
        return graph_mean_pool(hq, batch.pool1_graph, g)

    def _towers_fused(self, params: GINetParams, batch: GraphBatch) -> jax.Array:
        """Paper-mode towers fused: per quirk Q2 both towers run on the
        interface edges with independent weights, so their features
        concatenate and every gather/segment pass runs ONCE at double
        width (better MXU lane utilization, half the scatter passes) —
        numerics are bitwise those of two `_tower` calls (segment ops
        are column-independent). Returns [G, 64] = [tower | tower_ext].
        """
        n, c0, c1 = batch.num_nodes, batch.num_clusters0, batch.num_clusters1
        g = batch.num_graphs
        row, col = batch.edge_index[0], batch.edge_index[1]
        xw = jnp.concatenate(
            [batch.x @ params.conv1.fc_w.T, batch.x @ params.conv1_ext.fc_w.T],
            axis=1,
        )
        h = jax.nn.relu(
            segment_sum(
                gather(xw, col), row, n, sorted_ids=batch.edges_sorted
            )
        )
        hp = community_pooling_x(h, batch.assign0, c0, batch.mem0_idx)
        hw = jnp.concatenate(
            [hp[:, :16] @ params.conv2.fc_w.T,
             hp[:, 16:] @ params.conv2_ext.fc_w.T],
            axis=1,
        )
        prow, pcol = batch.pe_index[0], batch.pe_index[1]
        h2 = jax.nn.relu(
            segment_sum(
                gather(hw, pcol), prow, c0, sorted_ids=batch.edges_sorted
            )
        )
        hq = max_pool_x(h2, batch.assign1, c1, batch.mem1_idx)
        return graph_mean_pool(hq, batch.pool1_graph, g)

    def _towers_dense_fused(self, params: GINetParams, batch) -> jax.Array:
        """Dense-layout analog of :meth:`_towers_fused` (one
        `fused_gin_conv` per level at double width)."""
        import os

        from deeprank_gnn_tpu.ops import dense as dops
        from deeprank_gnn_tpu.ops.pallas import fused_gin_conv

        exact = not os.environ.get("DRGNN_DENSE_FAST")
        c0g = batch.pool0_mask.shape[1]
        c1g = batch.pool1_mask.shape[1]
        if batch.agg_x_fm is not None:
            # FEATURE-MAJOR level 1 (run-padded layout): the conv GEMM
            # contracts the sublane feature axis of [G, F, S] (node
            # axis on lanes — no tiled-layout padding anywhere), and
            # pooling is the lane-window tile max + tile member pool.
            # Same math as the agg_x branch below; ~7x fewer physical
            # HBM bytes at atomic scale (see collate_dense docstring).
            # ONE GEMM for both towers (weights concatenated on the
            # out-dim): agg_x_fm is read once instead of twice, forward
            # and in the dW adjoint
            w_cat = jnp.concatenate(
                [params.conv1.fc_w, params.conv1_ext.fc_w], axis=0
            )
            h = jax.nn.relu(
                jnp.einsum("of,gfrt->gort", w_cat, batch.agg_x_fm)
            )
            hp = dops.tiled_cluster_max_pool(
                h, batch.node_mask_fm, batch.tile_mem0, batch.tile_assign0
            )
        else:
            if batch.agg_x is not None:
                # Precomputed-operator path (`ops/dense.py`):
                # aggregation is a per-graph linear operator P, so
                # level 1 collapses to a plain GEMM — relu(P (x W)) ==
                # relu((P x) W) with P x = batch.agg_x precomputed at
                # collate/store build — and level 2 applies the tiny
                # stored pooled adjacency P1.
                h = jax.nn.relu(
                    jnp.concatenate(
                        [batch.agg_x @ params.conv1.fc_w.T,
                         batch.agg_x @ params.conv1_ext.fc_w.T],
                        axis=-1,
                    )
                )
            else:
                xw = jnp.concatenate(
                    [batch.x @ params.conv1.fc_w.T,
                     batch.x @ params.conv1_ext.fc_w.T],
                    axis=-1,
                )
                h = jax.nn.relu(
                    fused_gin_conv(xw, batch.row, batch.col, exact)
                )
            hp = dops.cluster_max_pool(h, batch.assign0, c0g, batch.mem0_idx)
        hw = jnp.concatenate(
            [hp[..., :16] @ params.conv2.fc_w.T,
             hp[..., 16:] @ params.conv2_ext.fc_w.T],
            axis=-1,
        )
        if batch.adj1 is not None:
            h2 = jax.nn.relu(dops.adj_conv(hw, batch.adj1, exact))
        else:
            h2 = jax.nn.relu(
                fused_gin_conv(hw, batch.pe_row, batch.pe_col, exact)
            )
        hq = dops.cluster_max_pool(h2, batch.assign1, c1g, batch.mem1_idx)
        return dops.masked_mean(hq, batch.pool1_mask)

    def _tower_dense(
        self,
        conv1: GINetConvParams,
        conv2: GINetConvParams,
        batch,
    ) -> jax.Array:
        """Dense per-graph tower: aggregation as one-hot MXU matmuls
        (semantics identical to `_tower`; see `ops/dense.py`)."""
        from deeprank_gnn_tpu.ops import dense as dops
        from deeprank_gnn_tpu.ops.pallas import fused_gin_conv

        import os

        # exact (default): fp32-faithful 3-pass bf16 contractions;
        # DRGNN_DENSE_FAST=1 runs single bf16 passes (~20% faster step,
        # operands rounded to 8 mantissa bits)
        exact = not os.environ.get("DRGNN_DENSE_FAST")
        c0g = batch.pool0_mask.shape[1]
        c1g = batch.pool1_mask.shape[1]

        def conv_att(conv, x, row, col, edge_attr, size):
            """Attention conv — dense analog of `ginet_conv`'s 'fixed'
            non-paper mode (real per-neighborhood softmax); pad edges
            (sentinel row/col) drop via the zero one-hot."""
            xw = x @ conv.fc_w.T
            msg = dops.gather_nodes(xw, col)  # [G,E,F]
            xrow = dops.gather_nodes(xw, row)
            ed = edge_attr @ conv.fc_edge_w.T
            logits = (
                jnp.concatenate([xrow, msg, ed], axis=-1) @ conv.fc_att_w.T
            )
            logits = jax.nn.leaky_relu(logits[..., 0])
            alpha = dops.dense_segment_softmax(logits, row, size)
            return dops.edge_sum_to_slots(msg * alpha[..., None], row, size)

        if self.attention:
            ng = batch.x.shape[1]
            pe_attr = dops.edge_sum_to_slots(
                batch.edge_attr, batch.edge_to_pe, batch.pe_row.shape[1]
            )
            h = jax.nn.relu(
                conv_att(
                    conv1, batch.x, batch.row, batch.col, batch.edge_attr, ng
                )
            )
            hp = dops.cluster_max_pool(h, batch.assign0, c0g, batch.mem0_idx)
            h2 = jax.nn.relu(
                conv_att(conv2, hp, batch.pe_row, batch.pe_col, pe_attr, c0g)
            )
        else:
            xw = batch.x @ conv1.fc_w.T
            h = jax.nn.relu(fused_gin_conv(xw, batch.row, batch.col, exact))
            hp = dops.cluster_max_pool(h, batch.assign0, c0g, batch.mem0_idx)
            hw = hp @ conv2.fc_w.T
            h2 = jax.nn.relu(
                fused_gin_conv(hw, batch.pe_row, batch.pe_col, exact)
            )
        hq = dops.cluster_max_pool(h2, batch.assign1, c1g, batch.mem1_idx)
        return dops.masked_mean(hq, batch.pool1_mask)

    def apply(
        self,
        params: GINetParams,
        batch,
        *,
        training: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        from deeprank_gnn_tpu.data.dense_batch import DenseGraphBatch
        from deeprank_gnn_tpu.parallel.halo import HaloBatch, ginet_apply_halo

        if isinstance(batch, HaloBatch):
            # local per-shard view inside a shard_map'd step — explicit
            # halo-exchange message passing (parallel/halo.py)
            return ginet_apply_halo(
                self, params, batch, training=training, rng=rng
            )
        fuse = not (self.attention or self.internal_tower)
        if isinstance(batch, DenseGraphBatch):
            if self.internal_tower:
                # the dense layout carries no internal-edge fields;
                # falling through would silently run the Q2 wiring
                raise NotImplementedError(
                    "GINet(internal_tower=True) needs layout='sparse' "
                    "(the dense batch carries interface edges only)"
                )
            if fuse:
                h = self._towers_dense_fused(params, batch)
            else:
                t1 = self._tower_dense(params.conv1, params.conv2, batch)
                t2 = self._tower_dense(
                    params.conv1_ext, params.conv2_ext, batch
                )
                h = jnp.concatenate([t1, t2], axis=1)
            h = jax.nn.relu(linear(h, params.fc1_w, params.fc1_b))
            h = dropout(h, self.dropout_rate, rng, training)
            return linear(h, params.fc2_w, params.fc2_b)
        if fuse:
            h = self._towers_fused(params, batch)
        else:
            t1 = self._tower(params.conv1, params.conv2, batch)
            t2 = self._tower(
                params.conv1_ext,
                params.conv2_ext,
                batch,
                internal=self.internal_tower,
            )
            h = jnp.concatenate([t1, t2], axis=1)
        h = jax.nn.relu(linear(h, params.fc1_w, params.fc1_b))
        h = dropout(h, self.dropout_rate, rng, training)
        return linear(h, params.fc2_w, params.fc2_b)

    __call__ = apply
