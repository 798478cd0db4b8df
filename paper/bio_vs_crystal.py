"""Classify biological vs crystal interfaces with the paper's
pretrained model.

Equivalent of reference
`paper_pretrained_models/biological_vs_crystal_interfaces/prediction_phy_non-phy.py`.
"""

from deeprank_gnn_tpu.featurize.graphgen import GraphHDF5
from deeprank_gnn_tpu import NeuralNet
from deeprank_gnn_tpu.models import GINet
from deeprank_gnn_tpu.tools import add_target

PDB_PATH = "../DC/pdb/"
PSSM_PATH = "../DC/pssm/"
DATABASE = "biological_vs_crystal.hdf5"
PRETRAINED = "tclass_ybio_interface_b128_e50_lr0.001_26.pth.tar"

if __name__ == "__main__":
    GraphHDF5(
        pdb_path=PDB_PATH,
        pssm_path=PSSM_PATH,
        biopython=False,
        graph_type="residue",
        outfile=DATABASE,
        nproc=8,
    )

    # benchmark mode: inject ground-truth labels to compute metrics
    add_target(
        graph_path=DATABASE,
        target_name="bio_interface",
        target_list="bio_interfaces.txt",
    )

    model = NeuralNet(DATABASE, GINet, pretrained_model=PRETRAINED)
    model.test(hdf5="prediction_phy_non-phy.hdf5", threshold=1)

    m = model.get_metrics("test", threshold=1.0)
    print("accuracy:", m.accuracy)
    print("specificity:", m.specificity)
    print("sensitivity:", m.sensitivity)
    print("precision:", m.precision)
    print("FPR:", m.FPR)
    print("FNR:", m.FNR)
