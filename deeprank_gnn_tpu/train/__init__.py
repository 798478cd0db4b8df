"""Training/eval engine: the reference `NeuralNet.py` capability set on
a jitted optax training loop, plus metrics, checkpointing and epoch
HDF5 export."""

from deeprank_gnn_tpu.train.neuralnet import NeuralNet
from deeprank_gnn_tpu.train.metrics import Metrics, get_binary, get_comparison

__all__ = ["NeuralNet", "Metrics", "get_binary", "get_comparison"]
