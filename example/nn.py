"""Train a GINet scorer on featurized graphs.

Equivalent of reference `example/nn.py`.
"""

from deeprank_gnn_tpu import NeuralNet
from deeprank_gnn_tpu.models import GINet

database = "./1ATN_residue.hdf5"

if __name__ == "__main__":
    nn = NeuralNet(
        database,
        GINet,
        node_feature=["type", "polarity", "bsa", "depth", "hse", "ic", "pssm"],
        edge_feature=["dist"],
        target="irmsd",
        index=None,
        task="reg",
        batch_size=64,
        percent=[0.8, 0.2],
    )
    nn.train(nepoch=250, validate=False)
    nn.plot_scatter()
