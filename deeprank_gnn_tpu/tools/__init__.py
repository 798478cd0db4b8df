"""User-facing utilities (reference `deeprank_gnn/tools/`): target
injection, epoch-output CSV conversion, 2D embeddings, PSSM format
conversion."""

from deeprank_gnn_tpu.tools.customize_graph import add_target
from deeprank_gnn_tpu.tools.hdf5_to_csv import hdf5_to_csv
from deeprank_gnn_tpu.tools.embedding import manifold_embedding
from deeprank_gnn_tpu.tools.pssm_3dcons import pssm_3dcons_to_deeprank

__all__ = [
    "add_target",
    "hdf5_to_csv",
    "manifold_embedding",
    "pssm_3dcons_to_deeprank",
]
