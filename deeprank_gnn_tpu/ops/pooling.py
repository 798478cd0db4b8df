"""Hierarchical community-pooling reductions over padded batches.

Reproduces the device-side math of the reference's community pooling
(reference `community_pooling.py:161-251`):

- node features are **max**-pooled over cluster members
  (`scatter_max`, `community_pooling.py:201`),
- positions are **mean**-pooled (`community_pooling.py:213-214`),
- per-graph readout is a mean over nodes (`ginet.py:133-134`),
- `max_pool_x` is a plain cluster max-pool (`ginet.py:114`).

The cluster *assignment* vectors arrive precomputed from the host
batcher (offline MCL/Louvain clustering stored in HDF5, reference
`DataSet.py:45-88`; batch offsetting of `get_preloaded_cluster`,
`community_pooling.py:25-30`, is folded into the assignment at collate
time) — the device only runs the dense reductions, which is the
TPU-idiomatic split.
"""

from __future__ import annotations

import jax

from deeprank_gnn_tpu.ops.segment import segment_max, segment_mean


def _member_max_flat(
    x: jax.Array, assign: jax.Array, mem_idx: jax.Array
) -> jax.Array:
    """Scatter-free cluster max through a flat member table [C, M]
    (`ops.dense.member_max_pool` with a singleton graph axis): the
    unsorted segment_max scatter serializes on TPU; this is flat row
    gathers both directions."""
    from deeprank_gnn_tpu.ops.dense import member_max_pool

    return member_max_pool(x[None], mem_idx[None], assign[None])[0]


def community_pooling_x(
    x: jax.Array, assign: jax.Array, num_clusters: int, mem_idx=None
) -> jax.Array:
    """Max-pool node features over cluster members. [N,F]x[N] -> [C,F].
    With a member table (`GraphBatch.mem0_idx`) the pool is gather-based
    and scatter-free."""
    if mem_idx is not None:
        return _member_max_flat(x, assign, mem_idx)
    return segment_max(x, assign, num_clusters)


def community_pooling_pos(
    pos: jax.Array, assign: jax.Array, num_clusters: int
) -> jax.Array:
    """Mean-pool node positions over cluster members. [N,3]x[N] -> [C,3]."""
    return segment_mean(pos, assign, num_clusters)


def max_pool_x(
    x: jax.Array, assign: jax.Array, num_clusters: int, mem_idx=None
) -> jax.Array:
    """PyG `max_pool_x` equivalent (reference `ginet.py:114`)."""
    if mem_idx is not None:
        return _member_max_flat(x, assign, mem_idx)
    return segment_max(x, assign, num_clusters)


def graph_mean_pool(
    x: jax.Array, graph_ids: jax.Array, num_graphs: int
) -> jax.Array:
    """Per-graph mean readout (`scatter_mean(x, batch)`,
    reference `ginet.py:133-134`). [N,F]x[N] -> [G,F]."""
    return segment_mean(x, graph_ids, num_graphs)
