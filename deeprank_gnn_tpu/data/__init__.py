"""Data layer: HDF5 residue-graph ingest and padded, bucketed batching.

Replaces the reference's torch-geometric `Dataset`/`DataLoader` stack
(reference `DataSet.py`, `NeuralNet.py:153-175`) with:

- :class:`HDF5DataSet` — lazy per-graph loading from the reference's
  HDF5 schema (groups `node_data/*`, `edge_index`, `edge_data/*`,
  `internal_edge_*`, `score/*`, `clustering/<method>/depth_{0,1}`).
- :class:`GraphBatch` — a static-shaped, padded pytree in which all
  integer bookkeeping (graph offsets, cluster renumbering, pooled-edge
  coalescing) has been precomputed on the host, so the device graph is
  pure gather/GEMM/segment-reduce.
- :class:`GraphLoader` — size-bucketed batch iterator (few distinct
  padded shapes -> few XLA compilations).
"""

from deeprank_gnn_tpu.data.dataset import HDF5DataSet, DivideDataSet, PreCluster
from deeprank_gnn_tpu.data.batch import GraphBatch, collate, GraphLoader

__all__ = [
    "HDF5DataSet",
    "DivideDataSet",
    "PreCluster",
    "GraphBatch",
    "collate",
    "GraphLoader",
]
