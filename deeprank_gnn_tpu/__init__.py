"""deeprank_gnn_tpu — a TPU-native graph neural network framework for
protein-protein interface scoring.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
DeepRank-GNN (reference: /root/reference, DeepRank/Deeprank-GNN v0.1.4):

- Offline featurization of protein-protein docking models (PDB) into
  residue-level interface graphs stored in HDF5
  (:mod:`deeprank_gnn_tpu.featurize`, reference `GraphGenMP.py`,
  `ResidueGraph.py`).
- Padded, size-bucketed graph batches with host-precomputed pooling
  structure (:mod:`deeprank_gnn_tpu.data`, replacing torch-geometric's
  dynamic `DataLoader` collation, reference `DataSet.py`).
- GINet / FoutNet / sGAT model families with hierarchical community
  pooling, as pure jitted functions over parameter pytrees
  (:mod:`deeprank_gnn_tpu.models`, reference `ginet.py`, `foutnet.py`,
  `sGAT.py`, `community_pooling.py`).
- A training/eval engine with the reference's `NeuralNet` API surface
  (:mod:`deeprank_gnn_tpu.train`, reference `NeuralNet.py`), backed by
  optax and jitted train steps.
- Multi-chip scale-out over a `jax.sharding.Mesh` (data-parallel x
  edge-parallel) via `shard_map` + XLA collectives
  (:mod:`deeprank_gnn_tpu.parallel`) — a capability the reference does
  not have (single-device only, reference `NeuralNet.py:207-208`).
"""

__version__ = "0.1.0"

from deeprank_gnn_tpu.data.dataset import HDF5DataSet, DivideDataSet, PreCluster
from deeprank_gnn_tpu.models import GINet, FoutNet, sGAT
from deeprank_gnn_tpu.train.neuralnet import NeuralNet

__all__ = [
    "HDF5DataSet",
    "DivideDataSet",
    "PreCluster",
    "GINet",
    "FoutNet",
    "sGAT",
    "NeuralNet",
    "__version__",
]
