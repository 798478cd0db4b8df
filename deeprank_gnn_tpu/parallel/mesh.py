"""Mesh construction and per-leaf sharding specs for GraphBatch."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deeprank_gnn_tpu.data.batch import GraphBatch


def make_mesh(
    devices: Optional[Sequence] = None,
    dp: Optional[int] = None,
    ep: Optional[int] = None,
) -> Mesh:
    """Build a (dp, ep) mesh. Defaults: all devices, ep=2 when the
    device count is even and >1, else ep=1."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None and ep is None:
        ep = 2 if n % 2 == 0 and n > 1 else 1
        dp = n // ep
    elif dp is None:
        if n % ep:
            raise ValueError(f"ep={ep} does not divide {n} devices")
        dp = n // ep
    elif ep is None:
        if n % dp:
            raise ValueError(f"dp={dp} does not divide {n} devices")
        ep = n // dp
    if dp * ep != n:
        raise ValueError(f"mesh {dp}x{ep} != {n} devices")
    arr = np.array(devices).reshape(dp, ep)
    return Mesh(arr, ("dp", "ep"))


# GraphBatch leaves by role: which mesh axis shards which array axis.
_NODE_FIELDS = {"x": 0, "pos": 0, "node_graph": 0, "node_mask": 0, "assign0": 0}
_EDGE_FIELDS = {
    "edge_index": 1,
    "edge_attr": 0,
    "edge_mask": 0,
    "edge_to_pe": 0,
    "iedge_index": 1,
    "iedge_attr": 0,
    "iedge_mask": 0,
    "pe_index": 1,
    "pe_mask": 0,
    "iedge_to_pie": 0,
    "pie_index": 1,
    "pie_mask": 0,
}
_CLUSTER_FIELDS = {"pool0_graph": 0, "pool0_mask": 0, "assign1": 0,
                   "pool1_graph": 0, "pool1_mask": 0}
_GRAPH_FIELDS = {"y": None, "y_mask": None}


def batch_shardings(mesh: Mesh) -> GraphBatch:
    """A GraphBatch of NamedShardings: nodes/clusters sharded over
    ``dp``, edges over ``ep``, targets replicated. XLA's partitioner
    derives every collective (scatter-add all-reduces between the edge
    and node shardings) from these annotations."""

    def spec(axis_name, arr_axis):
        if arr_axis is None:
            return NamedSharding(mesh, P())
        parts = [None] * (arr_axis + 1)
        parts[arr_axis] = axis_name
        return NamedSharding(mesh, P(*parts))

    fields = {}
    for f, ax in _NODE_FIELDS.items():
        fields[f] = spec("dp", ax)
    for f, ax in _EDGE_FIELDS.items():
        fields[f] = spec("ep", ax)
    for f, ax in _CLUSTER_FIELDS.items():
        fields[f] = spec("dp", ax)
    for f, ax in _GRAPH_FIELDS.items():
        fields[f] = spec(None, ax)
    return GraphBatch(**fields)


def _put(arr, sh):
    arr = np.asarray(arr)
    if jax.process_count() > 1:
        return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])
    return jax.device_put(arr, sh)


def shard_batch(batch: GraphBatch, mesh: Mesh) -> GraphBatch:
    """Device-put a host batch with the canonical shardings.

    Works in multi-process (multi-host) runs too: every process holds
    the same full host batch and contributes its addressable shards via
    `make_array_from_callback`.
    """
    import dataclasses

    # the flat member tables are a single-process pooling fast path;
    # on a mesh the canonical shardings govern the pooling collectives,
    # so drop them (models fall back to segment reductions)
    batch = dataclasses.replace(batch, mem0_idx=None, mem1_idx=None)
    # carry the batch's static metadata so the two pytrees' treedefs
    # match under tree_map (static fields are part of the treedef)
    shardings = dataclasses.replace(
        batch_shardings(mesh), edges_sorted=batch.edges_sorted
    )
    return jax.tree_util.tree_map(_put, batch, shardings)


def dense_batch_shardings(mesh: Mesh):
    """The (single) sharding for every `DenseGraphBatch` leaf: each is
    [G, ...], and graphs are INDEPENDENT units of compute, so the graph
    axis shards over ALL mesh devices. Per-graph message passing,
    pooling and readout are then fully local to each device; the only
    cross-device traffic in a training step is the gradient all-reduce
    (psum) — the zero-halo layout a graph-wise-partitioned GNN batch
    admits."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def shard_dense_batch(batch, mesh: Mesh):
    """Device-put a DenseGraphBatch with graph-axis sharding."""
    g = batch.x.shape[0]
    n = mesh.devices.size
    if g % n:
        raise ValueError(
            f"dense mesh layout needs batch graphs ({g}) divisible by "
            f"device count ({n}); pick batch_size accordingly"
        )
    sh = dense_batch_shardings(mesh)
    # every leaf is [G, ...] with the same graph-axis sharding, and
    # optional leaves (precomputed operators) may be absent — map over
    # the batch itself rather than a field-complete sharding pytree
    return jax.tree_util.tree_map(lambda a: _put(a, sh), batch)


def dense_local_slice(global_g: int, mesh: Mesh) -> slice:
    """This process's contiguous slice of the global graph axis under
    :func:`dense_batch_shardings`.

    The scalable multi-host ingest contract: each host loads ONLY the
    graphs in this slice of every global batch (instead of the
    reference-shaped "every host materializes the full batch"), then
    assembles the global array with
    :func:`shard_dense_batch_from_local`.
    """
    sh = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    pid = jax.process_index()
    spans = []
    for dev, idx in sh.devices_indices_map((global_g,)).items():
        if dev.process_index != pid:
            continue
        s = idx[0]
        spans.append((s.start or 0, global_g if s.stop is None else s.stop))
    spans.sort()
    lo, hi = spans[0][0], spans[-1][1]
    covered = sum(e - s for s, e in spans)
    if covered != hi - lo:
        raise ValueError(
            "this process's dense graph shards are not contiguous; "
            f"spans={spans}"
        )
    return slice(lo, hi)


def shard_dense_batch_from_local(local_batch, mesh: Mesh, global_g: int):
    """Assemble a globally-sharded DenseGraphBatch from per-process
    LOCAL data (each process holds only its :func:`dense_local_slice`
    of the graph axis). Works single-process too (local == global)."""
    sh = dense_batch_shardings(mesh)

    def put(arr):
        arr = np.asarray(arr)
        return jax.make_array_from_process_local_data(
            sh, arr, (global_g,) + arr.shape[1:]
        )

    return jax.tree_util.tree_map(put, local_batch)
