"""Host-side community detection / pooling API.

API-compatible surface of the reference `community_pooling.py` (same
function names and signatures modulo torch tensors -> numpy arrays):
`community_detection`, `community_detection_per_batch`,
`community_pooling`, `get_preloaded_cluster`, plus `graclus_cluster`
(the torch-cluster C++ kernel the reference declares at `setup.py:45`
and uses in its README custom-net example).

These run on the host over numpy arrays. The *device* pooling path
does not call them — cluster assignments are precomputed offline
(`PreCluster`) and the batcher folds them into static pooling plans
(`data/batch.py`); this module exists for exploration, PreCluster, and
API familiarity.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import numpy as np

from deeprank_gnn_tpu.featurize.cluster import (
    community_detection as _community_detection,
)
from deeprank_gnn_tpu.featurize.cluster import louvain_partition, run_mcl


def community_detection(
    edge_index, num_nodes: int, edge_attr=None, method: str = "mcl"
) -> np.ndarray:
    """Cluster one graph's nodes (reference `community_pooling.py:95-158`).

    edge_attr is accepted for signature parity; like the reference's
    MCL path, weights do not change the default clustering.
    """
    return _community_detection(np.asarray(edge_index), num_nodes, method=method)


def community_detection_per_batch(
    edge_index,
    batch,
    num_nodes: int,
    edge_attr=None,
    method: str = "mcl",
) -> np.ndarray:
    """Cluster each graph of a batch independently with globally unique
    cluster ids (reference `community_pooling.py:33-92`)."""
    edge_index = np.asarray(edge_index)
    batch = np.asarray(batch)
    cluster = np.zeros(num_nodes, dtype=np.int64)
    ncluster = 0
    for gid in range(int(batch.max()) + 1):
        nodes = np.nonzero(batch == gid)[0]
        remap = {int(n): i for i, n in enumerate(nodes)}
        mask = np.isin(edge_index[0], nodes) & np.isin(edge_index[1], nodes)
        sub = edge_index[:, mask]
        sub = np.array(
            [[remap[int(a)] for a in sub[0]], [remap[int(b)] for b in sub[1]]],
            dtype=np.int64,
        ).reshape(2, -1)
        c = _community_detection(sub, len(nodes), method=method)
        cluster[nodes] = c + ncluster
        ncluster = int(cluster.max()) + 1
    return cluster


def get_preloaded_cluster(cluster, batch) -> np.ndarray:
    """Offset per-graph cluster ids to be batch-global (reference
    `community_pooling.py:25-30` — without the in-place mutation)."""
    cluster = np.array(cluster, copy=True)
    batch = np.asarray(batch)
    nbatch = int(batch.max()) + 1
    for ib in range(1, nbatch):
        cluster[batch == ib] += cluster[batch == ib - 1].max() + 1
    return cluster


@dataclass
class PooledGraph:
    """Result of host-side `community_pooling`."""

    x: np.ndarray
    edge_index: np.ndarray
    edge_attr: Optional[np.ndarray]
    pos: Optional[np.ndarray] = None
    batch: Optional[np.ndarray] = None
    internal_edge_index: Optional[np.ndarray] = None
    internal_edge_attr: Optional[np.ndarray] = None
    cluster0: Optional[np.ndarray] = None
    cluster1: Optional[np.ndarray] = None

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]


def _pool_edges_host(cluster, edge_index, edge_attr):
    mapped = cluster[np.asarray(edge_index)]
    keep = mapped[0] != mapped[1]
    pairs = mapped[:, keep]
    if pairs.shape[1] == 0:
        fe = 0 if edge_attr is None else np.asarray(edge_attr).shape[1]
        return np.zeros((2, 0), dtype=np.int64), np.zeros((0, fe))
    uniq, inv = np.unique(pairs.T, axis=0, return_inverse=True)
    if edge_attr is None:
        return uniq.T, None
    attr = np.asarray(edge_attr)[keep]
    pooled = np.zeros((uniq.shape[0], attr.shape[1]), dtype=attr.dtype)
    np.add.at(pooled, inv, attr)
    return uniq.T, pooled


def community_pooling(cluster, data) -> PooledGraph:
    """Pool a (batched) graph by a cluster assignment (reference
    `community_pooling.py:161-251`): max-pooled features, mean-pooled
    positions, coalesced edges (duplicates attr-summed, self-loops
    dropped), pooled batch vector; cluster0/1 pass through."""
    cluster = np.asarray(cluster)
    uniq, inv = np.unique(cluster, return_inverse=True)
    k = len(uniq)
    x = np.asarray(data.x)
    pooled_x = np.full((k, x.shape[1]), -np.inf, dtype=x.dtype)
    np.maximum.at(pooled_x, inv, x)
    pooled_x[np.isinf(pooled_x)] = 0

    edge_index, edge_attr = _pool_edges_host(
        inv, data.edge_index, getattr(data, "edge_attr", None)
    )
    iei = getattr(data, "internal_edge_index", None)
    if iei is not None:
        internal_edge_index, internal_edge_attr = _pool_edges_host(
            inv, iei, getattr(data, "internal_edge_attr", None)
        )
    else:
        internal_edge_index = internal_edge_attr = None

    pos = getattr(data, "pos", None)
    if pos is not None:
        pos = np.asarray(pos)
        pooled_pos = np.zeros((k, pos.shape[1]))
        count = np.zeros(k)
        np.add.at(pooled_pos, inv, pos)
        np.add.at(count, inv, 1.0)
        pooled_pos /= np.maximum(count, 1)[:, None]
    else:
        pooled_pos = None

    batch = getattr(data, "batch", None)
    if batch is not None:
        batch = np.asarray(batch)
        pooled_batch = np.zeros(k, dtype=batch.dtype)
        pooled_batch[inv] = batch  # any member works: clusters don't span graphs
    else:
        pooled_batch = None

    return PooledGraph(
        x=pooled_x,
        edge_index=edge_index,
        edge_attr=edge_attr,
        pos=pooled_pos,
        batch=pooled_batch,
        internal_edge_index=internal_edge_index,
        internal_edge_attr=internal_edge_attr,
        cluster0=getattr(data, "cluster0", None),
        cluster1=getattr(data, "cluster1", None),
    )


def graclus_cluster(
    edge_index, num_nodes: int, edge_weight=None, seed: int = 0
) -> np.ndarray:
    """Greedy heavy-edge matching coarsening (the torch-cluster
    `graclus` C++/CUDA kernel's semantics, declared by the reference at
    `setup.py:45` and used in its README custom-net example).

    Each node is matched with its heaviest unmatched neighbor;
    unmatched nodes become singletons. Deterministic node order.
    """
    edge_index = np.asarray(edge_index)
    cluster = np.full(num_nodes, -1, dtype=np.int64)
    if edge_index.size:
        w = (
            np.ones(edge_index.shape[1])
            if edge_weight is None
            else np.asarray(edge_weight).reshape(-1)
        )
        # adjacency lists sorted by descending weight
        order = np.argsort(-w, kind="stable")
        nbrs: Dict[int, list] = {}
        for e in order:
            a, b = int(edge_index[0, e]), int(edge_index[1, e])
            if a != b:
                nbrs.setdefault(a, []).append(b)
                nbrs.setdefault(b, []).append(a)
        nxt = 0
        for v in range(num_nodes):
            if cluster[v] >= 0:
                continue
            match = -1
            for u in nbrs.get(v, []):
                if cluster[u] < 0 and u != v:
                    match = u
                    break
            cluster[v] = nxt
            if match >= 0:
                cluster[match] = nxt
            nxt += 1
    unmatched = cluster < 0
    cluster[unmatched] = np.arange(int(cluster.max()) + 1,
                                   int(cluster.max()) + 1 + unmatched.sum())
    return cluster


def plot_graph(graph, cluster, out: Optional[str] = None) -> None:
    """Spring-layout plot colored by cluster (reference
    `community_pooling.py:17-22`), saved to a file."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import networkx as nx

    pos = nx.spring_layout(graph, iterations=200)
    nx.draw(graph, pos, node_color=list(cluster))
    plt.savefig(out or "graph_clusters.png")
    plt.close()
