"""GNN model zoo: GINet, FoutNet, sGAT.

Pure-functional re-designs of the reference's model family (reference
`ginet.py`, `foutnet.py`, `sGAT.py`): each model is an `init(rng, ...)`
-> parameter pytree plus an `apply(params, batch, ...)` pure function,
jit/grad/vmap/pjit-friendly. Parameter layouts match the torch
checkpoints (weights stored [out, in]) so pretrained `.pt`/`.pth.tar`
files import losslessly (:mod:`deeprank_gnn_tpu.train.checkpoint`).
"""

from deeprank_gnn_tpu.models.ginet import GINet
from deeprank_gnn_tpu.models.foutnet import FoutNet
from deeprank_gnn_tpu.models.sgat import sGAT

MODELS = {"GINet": GINet, "FoutNet": FoutNet, "sGAT": sGAT}

__all__ = ["GINet", "FoutNet", "sGAT", "MODELS"]
