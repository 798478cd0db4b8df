"""Offline featurization pipeline (host-side).

Converts protein-protein docking models (PDB) into residue interface
graphs stored in HDF5, and computes the clustering / docking-quality
targets the training path consumes. This subsystem replaces the
reference's `GraphGenMP.py` / `ResidueGraph.py` / `tools/` stack
together with its external native dependencies (pdb2sql SQLite querying,
freesasa C SASA, markov_clustering / python-louvain), all re-implemented
from scratch in vectorized numpy/scipy.
"""

from deeprank_gnn_tpu.featurize.graphgen import GraphHDF5

__all__ = ["GraphHDF5", "AtomGraph", "ResidueGraph"]


def __getattr__(name):
    # lazy: keep `import deeprank_gnn_tpu.featurize` light
    if name == "AtomGraph":
        from deeprank_gnn_tpu.featurize.atom_graph import AtomGraph

        return AtomGraph
    if name == "ResidueGraph":
        from deeprank_gnn_tpu.featurize.residue_graph import ResidueGraph

        return ResidueGraph
    raise AttributeError(name)
