"""Pretrained paper-checkpoint workloads.

Loads the actual paper artifacts (reference `paper_pretrained_models/`)
into the JAX models through the torch-import path and runs them on
freshly-featurized graphs — the reference's pretrained-inference flow
(reference `paper_pretrained_models/scoring_of_docking_models/test.py`).
"""

import os

import numpy as np
import pytest

FOLD6 = (
    "/root/reference/paper_pretrained_models/scoring_of_docking_models/"
    "all_models/fold6_treg_yfnat_b128_e20_lr0.001_4.pt"
)
BIO = (
    "/root/reference/paper_pretrained_models/biological_vs_crystal_interfaces/"
    "tclass_ybio_interface_b128_e50_lr0.001_26.pth.tar"
)
PDB_DIR = "/root/reference/tests/data/pdb/1ATN"
PSSM_DIR = "/root/reference/tests/data/pssm/1ATN"
REF_DIR = "/root/reference/tests/data/ref/1ATN"


@pytest.fixture(scope="module")
def generated_hdf5(tmp_path_factory):
    """Graphs featurized by OUR pipeline: one-hot type/polarity ->
    the 48-feature layout the paper models expect (the committed
    fixture predates that layout, reference quirk Q7)."""
    from deeprank_gnn_tpu.featurize.graphgen import GraphHDF5

    out = str(tmp_path_factory.mktemp("pretrained") / "1ATN_gen.hdf5")
    GraphHDF5(
        pdb_path=PDB_DIR,
        ref_path=REF_DIR,
        pssm_path=PSSM_DIR,
        outfile=out,
        nproc=2,
    )
    return out


def test_fold6_fnat_regression(generated_hdf5, tmp_path):
    from deeprank_gnn_tpu import NeuralNet
    from deeprank_gnn_tpu.models import GINet

    nn = NeuralNet(
        generated_hdf5, GINet, pretrained_model=FOLD6, outdir=str(tmp_path)
    )
    # config restored from the torch checkpoint
    assert nn.target == "fnat" and nn.task == "reg"
    assert nn.node_feature == [
        "type", "polarity", "bsa", "charge", "cons", "ic", "pssm",
    ]
    assert nn.params.conv1.fc_w.shape == (16, 48)

    # torch Adam moments restored (step count 7044 in the checkpoint)
    import optax

    adam_state = nn.opt_state[0]
    assert isinstance(adam_state, optax.ScaleByAdamState)
    assert int(adam_state.count) == 7044
    # moments arrive raveled (the engine's flattened fused-update Adam)
    mu = np.asarray(adam_state.mu)
    assert mu.ndim == 1 and float(np.abs(mu).sum()) > 0

    nn.test(threshold=0.3)
    preds = np.asarray(nn.test_out)
    assert preds.shape == (4,)
    assert np.isfinite(preds).all()
    assert np.std(preds) > 1e-6  # discriminates between models
    # deterministic across runs
    nn2 = NeuralNet(
        generated_hdf5, GINet, pretrained_model=FOLD6, outdir=str(tmp_path)
    )
    nn2.test(threshold=0.3)
    np.testing.assert_allclose(preds, np.asarray(nn2.test_out), atol=1e-6)


def test_bio_interface_classifier(generated_hdf5, tmp_path):
    from deeprank_gnn_tpu import NeuralNet
    from deeprank_gnn_tpu.models import GINet

    nn = NeuralNet(
        generated_hdf5, GINet, pretrained_model=BIO, outdir=str(tmp_path)
    )
    assert nn.task == "class" and nn.node_feature == ["pssm"]
    assert nn.params.conv1.fc_w.shape == (16, 20)
    nn.test(threshold=1)
    # prediction mode: no 'bio_interface' target in our graphs
    assert nn.test_y is None
    preds = np.asarray(nn.test_out)
    assert preds.shape == (4,)
    assert set(np.unique(preds)).issubset({0, 1})
    # class probabilities exported
    raw = np.asarray(nn.data["test"]["raw_outputs"])
    assert raw.shape == (4, 2)
    np.testing.assert_allclose(raw.sum(axis=1), 1.0, atol=1e-5)
