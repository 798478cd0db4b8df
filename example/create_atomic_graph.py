"""Featurize docking models into ATOM-level interface graphs (HDF5).

A capability beyond the residue-only reference: nodes are heavy
interface atoms (5.5 Å cross-chain contacts), features keep the
residue names plus per-atom `bsa` and a one-hot element `atomtype`.
The output uses the same schema as residue graphs, so `nn.py` trains
on it unchanged — just add "atomtype" to `node_feature`.
"""

from deeprank_gnn_tpu.featurize.graphgen import GraphHDF5

pdb_path = "./data/pdb/1ATN/"
pssm_path = "./data/pssm/1ATN/"
ref = "./data/ref/1ATN/"

if __name__ == "__main__":
    GraphHDF5(
        pdb_path=pdb_path,
        ref_path=ref,
        pssm_path=pssm_path,
        graph_type="atomic",
        outfile="1ATN_atomic.hdf5",
        nproc=4,
    )
