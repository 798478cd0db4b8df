"""Learning-outcome tests (VERDICT r4 item 4).

Every other training test asserts losses are *finite* or *parity-exact*;
these assert training actually LEARNS:

- overfit: 50 scanned epochs on the 10-graph 1ATN fixture drive the
  train MSE far below its epoch-1 value (an LR/weight-decay/optimizer
  plumbing regression would fail this while passing every parity test);
  mirrors what the reference's train loop demonstrably does on the same
  fixture (reference `NeuralNet.py:265-355`).
- rank parity (Spearman rho == 1.0) of the imported fold6 paper
  checkpoint vs the executed torch oracle lives with the fold6 parity
  test (`test_reference_parity.py::test_fold6_pretrained_prediction_
  parity`): fold6 needs depth/hse features (48 input dims) that the
  10-graph residue fixture does not store (26 dims), so ranking is
  asserted on the featurizer-generated 1ATN docking models there.
"""

import numpy as np

from deeprank_gnn_tpu import NeuralNet
from deeprank_gnn_tpu.models import GINet

NODE_FEATS = ["type", "polarity", "bsa", "depth", "hse", "ic", "pssm"]


def test_overfit_fixture(tmp_path, fixture_hdf5):
    """Train MSE after 300 scanned epochs < 10% of the epoch-1 MSE.

    Calibration (this fixture, executed torch reference AND this
    framework, lr=0.01): both oscillate at 17-45 after 60 epochs — the
    reference's default lr is too hot for a 10-graph batch. At lr=0.003
    the loss descends 135 -> ~6.6 (mean of the last 10 epochs; the 0.4
    dropout keeps single-epoch values bouncing, so the tail mean is the
    stable signal; the epoch-minimum reaches ~0.7). Scanned epochs are
    ~7 ms each on CPU, so 300 epochs stay well inside the time budget.
    """
    nn = NeuralNet(
        fixture_hdf5,
        GINet,
        node_feature=NODE_FEATS,
        edge_feature=["dist"],
        target="irmsd",
        task="reg",
        batch_size=10,
        percent=[1.0, 0.0],
        outdir=str(tmp_path),
        layout="dense",
        device_cache=True,
        scan_epochs=True,
        lr=0.003,
    )
    nn.train(nepoch=300, validate=False)
    losses = np.asarray(nn.train_loss, dtype=np.float64)
    assert losses.shape == (300,)
    assert np.isfinite(losses).all()
    tail = losses[-10:].mean()
    assert tail < 0.1 * losses[0], (
        f"no learning: epoch-1 MSE {losses[0]:.4f} -> "
        f"last-10-epoch mean {tail:.4f}"
    )
    assert losses.min() < 0.05 * losses[0]


def test_looped_path_learns_too(tmp_path, fixture_hdf5):
    """Same overfit check through the NON-scanned per-batch dispatch
    path (the default engine configuration) — catches a plumbing
    regression that only affects one of the two training drivers."""
    nn = NeuralNet(
        fixture_hdf5,
        GINet,
        node_feature=NODE_FEATS,
        edge_feature=["dist"],
        target="irmsd",
        task="reg",
        batch_size=10,
        percent=[1.0, 0.0],
        outdir=str(tmp_path),
        lr=0.003,
    )
    nn.train(nepoch=120, validate=False)
    losses = np.asarray(nn.train_loss, dtype=np.float64)
    assert np.isfinite(losses).all()
    assert losses[-10:].mean() < 0.25 * losses[0], (
        f"no learning on the looped path: {losses[0]:.4f} -> "
        f"{losses[-10:].mean():.4f}"
    )
