"""FoutNet: pairwise interface convolution (reference `foutnet.py`).

The FoutLayer (Fout et al., NIPS 2017) computes, per node,
``x Wc + mean_{j in N(i)} (x_j Wn) + b``. The reference implements the
neighbor mean with an O(N*E) per-node Python loop (reference
`foutnet.py:69-73`); here it is a single segment-mean over edges —
identical numerics for nodes with neighbors. (The reference yields NaN
for isolated nodes via `torch.mean` of an empty slice; interface graphs
have no isolated nodes by construction, and we default to 0 instead —
see `segment_mean(nan_empty=...)`.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from deeprank_gnn_tpu.data.batch import GraphBatch
from deeprank_gnn_tpu.models.common import linear, linear_init, uniform_init
from deeprank_gnn_tpu.ops.segment import gather, segment_mean
from deeprank_gnn_tpu.ops.pooling import (
    community_pooling_x,
    graph_mean_pool,
    max_pool_x,
)


@jax.tree_util.register_dataclass
@dataclass
class FoutLayerParams:
    wc: jax.Array  # [in, out] — raw Parameter layout (x @ Wc)
    wn: jax.Array  # [in, out]
    bias: jax.Array  # [out]


@jax.tree_util.register_dataclass
@dataclass
class FoutNetParams:
    conv1: FoutLayerParams
    conv2: FoutLayerParams
    fc1_w: jax.Array
    fc1_b: jax.Array
    fc2_w: jax.Array
    fc2_b: jax.Array


def _layer_init(rng, in_ch: int, out_ch: int) -> FoutLayerParams:
    k1, k2, k3 = jax.random.split(rng, 3)
    return FoutLayerParams(
        wc=uniform_init(k1, (in_ch, out_ch), in_ch),
        wn=uniform_init(k2, (in_ch, out_ch), in_ch),
        bias=uniform_init(k3, (out_ch,), in_ch),
    )


def fout_layer(
    params: FoutLayerParams,
    x: jax.Array,
    edge_index: jax.Array,
    num_nodes: int,
    *,
    sorted_rows: bool = False,
) -> jax.Array:
    """Vectorized FoutLayer (reference `foutnet.py:56-82`)."""
    row, col = edge_index[0], edge_index[1]
    alpha = x @ params.wc
    beta = x @ params.wn
    gamma = segment_mean(
        gather(beta, col), row, num_nodes, sorted_ids=sorted_rows
    )
    return alpha + gamma + params.bias


class FoutNet:
    """Single-tower hierarchical net (reference `foutnet.py:90-126`)."""

    def __init__(
        self,
        input_shape: int,
        output_shape: int = 1,
        input_shape_edge: Optional[int] = None,
    ):
        self.input_shape = input_shape
        self.output_shape = output_shape
        self.input_shape_edge = input_shape_edge

    def init(self, rng: jax.Array) -> FoutNetParams:
        ks = jax.random.split(rng, 4)
        fc1_w, fc1_b = linear_init(ks[2], 32, 64)
        fc2_w, fc2_b = linear_init(ks[3], 64, self.output_shape)
        return FoutNetParams(
            conv1=_layer_init(ks[0], self.input_shape, 16),
            conv2=_layer_init(ks[1], 16, 32),
            fc1_w=fc1_w,
            fc1_b=fc1_b,
            fc2_w=fc2_w,
            fc2_b=fc2_b,
        )

    def _apply_dense(self, params: FoutNetParams, batch) -> jax.Array:
        from deeprank_gnn_tpu.ops import dense as dops

        ng = batch.x.shape[1]
        c0g = batch.pool0_mask.shape[1]
        c1g = batch.pool1_mask.shape[1]

        def layer(p, x, row, col, size):
            alpha = x @ p.wc
            beta = x @ p.wn
            gamma = dops.edge_mean_to_slots(
                dops.gather_nodes(beta, col), row, size
            )
            return alpha + gamma + p.bias

        if batch.agg_x is not None:
            # precomputed-operator path (`ops/dense.py`): the neighbor
            # MEAN is the sum operator row-normalized by in-degree, and
            # both commute with the (linear) wn projection:
            # mean_agg(x @ wn) == (P0 x / deg0) @ wn
            mean_x = batch.agg_x / jnp.maximum(batch.deg0, 1.0)[..., None]
            h = jax.nn.relu(
                batch.x @ params.conv1.wc
                + mean_x @ params.conv1.wn
                + params.conv1.bias
            )
            hp = dops.cluster_max_pool(h, batch.assign0, c0g, batch.mem0_idx)
            deg1 = jnp.maximum(
                batch.adj1.astype(jnp.float32).sum(axis=-1), 1.0
            )
            h2 = jax.nn.relu(
                hp @ params.conv2.wc
                + dops.adj_conv(hp @ params.conv2.wn, batch.adj1, True)
                / deg1[..., None]
                + params.conv2.bias
            )
        else:
            h = jax.nn.relu(
                layer(params.conv1, batch.x, batch.row, batch.col, ng)
            )
            hp = dops.cluster_max_pool(h, batch.assign0, c0g, batch.mem0_idx)
            h2 = jax.nn.relu(
                layer(params.conv2, hp, batch.pe_row, batch.pe_col, c0g)
            )
        hq = dops.cluster_max_pool(h2, batch.assign1, c1g, batch.mem1_idx)
        out = dops.masked_mean(hq, batch.pool1_mask)
        out = jax.nn.relu(linear(out, params.fc1_w, params.fc1_b))
        return linear(out, params.fc2_w, params.fc2_b)

    def apply(
        self,
        params: FoutNetParams,
        batch,
        *,
        training: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        del training, rng  # no dropout (reference `foutnet.py:123` is dead code)
        from deeprank_gnn_tpu.data.dense_batch import DenseGraphBatch
        from deeprank_gnn_tpu.parallel.halo import HaloBatch, fout_apply_halo

        if isinstance(batch, HaloBatch):
            return fout_apply_halo(self, params, batch)
        if isinstance(batch, DenseGraphBatch):
            return self._apply_dense(params, batch)
        n, c0, c1, g = (
            batch.num_nodes,
            batch.num_clusters0,
            batch.num_clusters1,
            batch.num_graphs,
        )
        h = jax.nn.relu(
            fout_layer(
                params.conv1, batch.x, batch.edge_index, n,
                sorted_rows=batch.edges_sorted,
            )
        )
        hp = community_pooling_x(h, batch.assign0, c0, batch.mem0_idx)
        h2 = jax.nn.relu(
            fout_layer(
                params.conv2, hp, batch.pe_index, c0,
                sorted_rows=batch.edges_sorted,
            )
        )
        hq = max_pool_x(h2, batch.assign1, c1, batch.mem1_idx)
        out = graph_mean_pool(hq, batch.pool1_graph, g)
        out = jax.nn.relu(linear(out, params.fc1_w, params.fc1_b))
        return linear(out, params.fc2_w, params.fc2_b)

    __call__ = apply
