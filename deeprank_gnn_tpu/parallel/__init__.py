"""Multi-chip scale-out over a `jax.sharding.Mesh`.

The reference is strictly single-process single-device (reference
`NeuralNet.py:207-208`; SURVEY §2.4 documents the absence of any
distributed runtime). This subsystem is the TPU-native scale-out the
new framework adds:

- ``dp`` axis: graph-level data parallelism — node/cluster arrays of
  the concatenated batch are sharded across ``dp``.
- ``ep`` axis: edge-level parallelism — the message-passing workload
  (per-edge gathers and segment reductions) is sharded across ``ep``;
  XLA's SPMD partitioner inserts the boundary-node all-reduces that a
  hand-written halo exchange would perform (the scaling-book recipe:
  pick a mesh, annotate shardings, let XLA insert collectives).

Gradient reduction across the mesh falls out of the same partitioner:
the loss is a full reduction, so param grads arrive replicated.
"""

from deeprank_gnn_tpu.parallel.mesh import make_mesh, batch_shardings
from deeprank_gnn_tpu.parallel.step import make_sharded_train_step

__all__ = ["make_mesh", "batch_shardings", "make_sharded_train_step"]
