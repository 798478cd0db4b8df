"""Sparse segment / gather / coalesce primitives for padded graph batches.

These are the TPU-native replacements for the torch-scatter /
torch-sparse compiled extensions the reference delegates to
(reference `setup.py:45-46`): every neighborhood aggregation, graph
readout and pooling reduction in the model zoo bottoms out here.

Two implementation tiers share one semantics:

- :mod:`deeprank_gnn_tpu.ops.segment` — pure XLA (`jax.ops.segment_*`)
  versions, used as the portable reference path (CPU tests, interpret
  mode) and as the autodiff-friendly default.
- :mod:`deeprank_gnn_tpu.ops.pallas` — hand-written Pallas TPU kernels
  for the hot fused gather->GEMM->scatter message-passing path.
"""

from deeprank_gnn_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_min,
    segment_softmax,
    gather,
)
from deeprank_gnn_tpu.ops.coalesce import coalesce_edges
from deeprank_gnn_tpu.ops.pooling import (
    community_pooling_x,
    community_pooling_pos,
    max_pool_x,
    graph_mean_pool,
)

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_min",
    "segment_softmax",
    "gather",
    "coalesce_edges",
    "community_pooling_x",
    "community_pooling_pos",
    "max_pool_x",
    "graph_mean_pool",
]
