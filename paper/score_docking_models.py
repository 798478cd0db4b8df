"""Score docking models with the paper's pretrained fnat regressor.

Equivalent of reference
`paper_pretrained_models/scoring_of_docking_models/test.py`: featurize
docking models, then run the fold6 pretrained GINet (the torch `.pt`
checkpoint loads directly).
"""

import glob
import time

from deeprank_gnn_tpu.featurize.graphgen import GraphHDF5
from deeprank_gnn_tpu import NeuralNet
from deeprank_gnn_tpu.models import GINet

PDB_PATH = "../tests/data/pdb/1ATN/"
PSSM_PATH = "../tests/data/pssm/1ATN/"
PRETRAINED = "fold6_treg_yfnat_b128_e20_lr0.001_4.pt"

if __name__ == "__main__":
    GraphHDF5(
        pdb_path=PDB_PATH,
        pssm_path=PSSM_PATH,
        graph_type="residue",
        outfile="1ATN_residue.hdf5",
        nproc=4,
    )

    database_test = glob.glob("./*.hdf5")
    start_time = time.time()
    model = NeuralNet(database_test, GINet, pretrained_model=PRETRAINED)
    model.test(threshold=0.3)
    print(f"Elapsed time: {time.time() - start_time:.2f} s")
    for mol, pred in zip(model.data["test"]["mol"], model.data["test"]["outputs"]):
        print(mol, pred)
