"""Static-shape edge coalescing (the torch-sparse `coalesce` replacement).

The reference pools edges after each community-pooling stage through
PyG's `pool_edge` (reference `community_pooling.py:204-210`), which maps
edge endpoints through the cluster assignment, drops self-loops, and
merges duplicate edges by *summing* their attributes — implemented
there by the torch-sparse C++/CUDA extension.

On TPU everything must be static-shaped, so this version keeps the
padded edge capacity E and compacts unique edges to the front:

    sort edges by key (src * N + dst)  ->  flag segment boundaries
    ->  prefix-sum boundary flags into output slots
    ->  segment-sum attributes into slots.

Padding edges and self-loops get the maximal key so they sort to the
back and fall into the dump row. Output edges come out sorted by
(src, dst) — the same canonical order torch-sparse `coalesce` produces.

The main training path does NOT run this on device: the batcher
precomputes the pooled-edge structure on the host (clusters are offline
per the reference design, `DataSet.py:45-88`) and the device only
segment-sums attributes. This kernel exists for on-line clustering
(graclus-style) and as the semantics oracle for the host batcher.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from deeprank_gnn_tpu.ops.segment import segment_sum

_INT32_MAX = jnp.iinfo(jnp.int32).max


def coalesce_edges(
    edge_index: jax.Array,
    edge_attr: jax.Array,
    edge_mask: jax.Array,
    num_nodes: int,
    *,
    remove_self_loops: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Coalesce a padded edge list.

    Args:
        edge_index: [2, E] int32 endpoints (already mapped through any
            cluster assignment by the caller).
        edge_attr: [E, F] float attributes; duplicate edges are summed.
        edge_mask: [E] bool validity of each padded lane.
        num_nodes: static bound on node ids (keys use base num_nodes).
        remove_self_loops: drop (i, i) edges, as PyG `pool_edge` does.

    Returns:
        (new_edge_index [2, E], new_edge_attr [E, F], new_mask [E]) with
        unique edges compacted to the front in (src, dst) sorted order.
    """
    if num_nodes * num_nodes >= _INT32_MAX:
        raise ValueError(
            f"num_nodes={num_nodes} too large for int32 coalesce keys"
        )
    src, dst = edge_index[0], edge_index[1]
    e = src.shape[0]
    valid = edge_mask
    if remove_self_loops:
        valid = valid & (src != dst)

    key = src.astype(jnp.int32) * jnp.int32(num_nodes) + dst.astype(jnp.int32)
    key = jnp.where(valid, key, _INT32_MAX)

    order = jnp.argsort(key, stable=True)
    skey = key[order]
    sattr = edge_attr[order]
    svalid = valid[order]

    prev = jnp.concatenate([jnp.full((1,), -1, dtype=skey.dtype), skey[:-1]])
    boundary = (skey != prev) & svalid
    slot = jnp.cumsum(boundary.astype(jnp.int32)) - 1  # [-1 .. n_unique-1]
    num_unique = jnp.sum(boundary.astype(jnp.int32))
    slot = jnp.where(svalid, slot, e)  # dump row for padding

    new_attr = segment_sum(sattr, slot, e)

    # Compact the unique keys into their slots (one writer per slot: the
    # boundary lane), then decode endpoints.
    key_slot = jnp.where(boundary, slot, e)
    unique_key = segment_sum(
        jnp.where(boundary, skey, 0).astype(jnp.int32)[:, None], key_slot, e
    )[:, 0]
    new_mask = jnp.arange(e, dtype=jnp.int32) < num_unique
    new_src = jnp.where(new_mask, unique_key // num_nodes, num_nodes)
    new_dst = jnp.where(new_mask, unique_key % num_nodes, num_nodes)
    new_index = jnp.stack([new_src, new_dst]).astype(jnp.int32)
    return new_index, new_attr, new_mask
