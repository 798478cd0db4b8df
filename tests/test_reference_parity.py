"""Parity vs the *executed* PyTorch reference (torch oracle).

The oracle in tests/torch_oracle.py re-executes the reference's forward
semantics in plain torch (reference `ginet.py`, `foutnet.py`, `sGAT.py`,
`community_pooling.py:161-251`, `DataSet.py:231-366`).  Here we assert:

- per-layer activations of the JAX GINet allclose to the torch oracle
  on the committed 1ATN fixture, for batch sizes 1 and 10,
- identical FoutNet / sGAT outputs with shared random weights,
- identical parameter *gradients* (MSE loss) — the training-step parity
  gate modulo optimizer numerics,
- the paper's pretrained fold6 + bio-interface checkpoints produce the
  same predictions through `NeuralNet.test()` as through the oracle.
"""

import numpy as np
import pytest
import torch

import torch_oracle as oracle

FIXTURE_FEATS = ["type", "polarity", "bsa", "charge", "cons", "ic", "pssm"]
FOLD6 = (
    "/root/reference/paper_pretrained_models/scoring_of_docking_models/"
    "all_models/fold6_treg_yfnat_b128_e20_lr0.001_4.pt"
)
BIO = (
    "/root/reference/paper_pretrained_models/biological_vs_crystal_interfaces/"
    "tclass_ybio_interface_b128_e50_lr0.001_26.pth.tar"
)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _jax_samples(db, node_feature, target):
    from deeprank_gnn_tpu.data.dataset import HDF5DataSet

    ds = HDF5DataSet(
        database=db,
        node_feature=node_feature,
        edge_feature=["dist"],
        target=target,
        clustering_method="mcl",
    )
    return [ds.get(i) for i in range(len(ds))], [
        ds.index_complexes[i][1] for i in range(len(ds))
    ]


def _torch_batch(db, mols, node_feature, target):
    graphs = [
        oracle.load_one_graph(db, m, node_feature, target=target) for m in mols
    ]
    return oracle.batch_graphs(graphs)


def _ginet_params_to_torch(model, params):
    sd = {}
    for tag, conv in [
        ("conv1", params.conv1),
        ("conv2", params.conv2),
        ("conv1_ext", params.conv1_ext),
        ("conv2_ext", params.conv2_ext),
    ]:
        sd[f"{tag}.fc.weight"] = torch.tensor(np.asarray(conv.fc_w))
        sd[f"{tag}.fc_edge_attr.weight"] = torch.tensor(np.asarray(conv.fc_edge_w))
        sd[f"{tag}.fc_attention.weight"] = torch.tensor(np.asarray(conv.fc_att_w))
    sd["fc1.weight"] = torch.tensor(np.asarray(params.fc1_w))
    sd["fc1.bias"] = torch.tensor(np.asarray(params.fc1_b))
    sd["fc2.weight"] = torch.tensor(np.asarray(params.fc2_w))
    sd["fc2.bias"] = torch.tensor(np.asarray(params.fc2_b))
    model.load_state_dict(sd)
    return model


def _jax_ginet_trace(params, batch):
    """Per-layer activations of the JAX GINet, computed with the same
    framework ops GINet.apply composes (verified against apply below)."""
    import jax.nn as jnn

    from deeprank_gnn_tpu.models.common import linear
    from deeprank_gnn_tpu.models.ginet import ginet_conv
    from deeprank_gnn_tpu.ops.pooling import (
        community_pooling_x,
        graph_mean_pool,
        max_pool_x,
    )
    from deeprank_gnn_tpu.ops.segment import segment_sum

    n, c0, c1, g = (
        batch.num_nodes,
        batch.num_clusters0,
        batch.num_clusters1,
        batch.num_graphs,
    )
    trace = {}

    def tower(conv1, conv2, tag):
        h = jnn.relu(
            ginet_conv(conv1, batch.x, batch.edge_index, batch.edge_attr, n)
        )
        trace[f"{tag}.conv1"] = h
        hp = community_pooling_x(h, batch.assign0, c0)
        trace[f"{tag}.pool0.x"] = hp
        pooled_attr = segment_sum(
            batch.edge_attr, batch.edge_to_pe, batch.pe_mask.shape[0]
        )
        trace[f"{tag}.pool0.edge_attr"] = pooled_attr
        h2 = jnn.relu(ginet_conv(conv2, hp, batch.pe_index, pooled_attr, c0))
        trace[f"{tag}.conv2"] = h2
        hq = max_pool_x(h2, batch.assign1, c1)
        trace[f"{tag}.pool1.x"] = hq
        out = graph_mean_pool(hq, batch.pool1_graph, g)
        trace[f"{tag}.readout"] = out
        return out

    t1 = tower(params.conv1, params.conv2, "t1")
    t2 = tower(params.conv1_ext, params.conv2_ext, "t2")
    h = np.concatenate([np.asarray(t1), np.asarray(t2)], axis=1)
    import jax.numpy as jnp

    fc1 = jnn.relu(linear(jnp.asarray(h), params.fc1_w, params.fc1_b))
    trace["fc1"] = fc1
    trace["out"] = linear(fc1, params.fc2_w, params.fc2_b)
    return trace


def _compare_traces(jax_trace, torch_trace, counts, atol=2e-5, rtol=2e-5):
    """Compare the valid (unpadded) prefix of every JAX activation
    against the torch oracle."""
    for key, torch_val in torch_trace.items():
        if key.endswith("edge_index"):
            continue
        jval = np.asarray(jax_trace[key])
        tval = torch_val.detach().numpy()
        jval = jval[: tval.shape[0]]
        np.testing.assert_allclose(
            jval, tval, atol=atol, rtol=rtol, err_msg=f"layer {key}"
        )


# ---------------------------------------------------------------------------
# GINet: random weights, per-layer, batch of 10 and batch of 1
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("nmols", [10, 1])
def test_ginet_per_layer_parity_random_weights(fixture_hdf5, nmols):
    import jax

    from deeprank_gnn_tpu.data.batch import collate
    from deeprank_gnn_tpu.models.ginet import GINet

    samples, mols = _jax_samples(fixture_hdf5, FIXTURE_FEATS, "irmsd")
    samples, mols = samples[:nmols], mols[:nmols]
    net = GINet(input_shape=samples[0].num_features)
    params = net.init(jax.random.PRNGKey(7))
    batch, got_mols = collate(samples)
    assert got_mols == mols

    jax_trace = _jax_ginet_trace(params, batch)
    # the manual trace must agree with the real model entry point
    np.testing.assert_allclose(
        np.asarray(net.apply(params, batch)),
        np.asarray(jax_trace["out"]),
        atol=1e-6,
    )

    tmodel = _ginet_params_to_torch(
        oracle.GINet(samples[0].num_features), params
    ).eval()
    tbatch = _torch_batch(fixture_hdf5, mols, FIXTURE_FEATS, "irmsd")
    torch_trace = {}
    with torch.no_grad():
        tout = tmodel(tbatch, trace=torch_trace)
    assert tout.shape == (nmols, 1)

    counts = None
    _compare_traces(jax_trace, torch_trace, counts)

    # pooled coalesced edge structure matches torch-sparse coalesce
    pe_valid = int(np.asarray(batch.pe_mask).sum())
    np.testing.assert_array_equal(
        np.asarray(batch.pe_index)[:, :pe_valid],
        torch_trace["t1.pool0.edge_index"].numpy(),
    )


# ---------------------------------------------------------------------------
# FoutNet / sGAT: output parity with shared random weights
# ---------------------------------------------------------------------------

def test_foutnet_output_parity(fixture_hdf5):
    import jax

    from deeprank_gnn_tpu.data.batch import collate
    from deeprank_gnn_tpu.models.foutnet import FoutNet

    samples, mols = _jax_samples(fixture_hdf5, FIXTURE_FEATS, "irmsd")
    net = FoutNet(input_shape=samples[0].num_features)
    params = net.init(jax.random.PRNGKey(3))
    batch, _ = collate(samples)
    jout = np.asarray(net.apply(params, batch))

    tmodel = oracle.FoutNet(samples[0].num_features)
    sd = {
        "conv1.Wc": torch.tensor(np.asarray(params.conv1.wc)),
        "conv1.Wn": torch.tensor(np.asarray(params.conv1.wn)),
        "conv1.bias": torch.tensor(np.asarray(params.conv1.bias)),
        "conv2.Wc": torch.tensor(np.asarray(params.conv2.wc)),
        "conv2.Wn": torch.tensor(np.asarray(params.conv2.wn)),
        "conv2.bias": torch.tensor(np.asarray(params.conv2.bias)),
        "fc1.weight": torch.tensor(np.asarray(params.fc1_w)),
        "fc1.bias": torch.tensor(np.asarray(params.fc1_b)),
        "fc2.weight": torch.tensor(np.asarray(params.fc2_w)),
        "fc2.bias": torch.tensor(np.asarray(params.fc2_b)),
    }
    tmodel.load_state_dict(sd)
    tbatch = _torch_batch(fixture_hdf5, mols, FIXTURE_FEATS, "irmsd")
    with torch.no_grad():
        tout = tmodel.eval()(tbatch).numpy()
    # the reference's per-node loop NaNs on pooled nodes with no pooled
    # edges (torch.mean of empty); our vectorized form returns 0 there.
    # On this fixture no such node exists, so outputs must match exactly.
    assert np.isfinite(tout).all()
    np.testing.assert_allclose(jout, tout, atol=2e-5, rtol=2e-5)


def test_sgat_output_parity(fixture_hdf5):
    import jax

    from deeprank_gnn_tpu.data.batch import collate
    from deeprank_gnn_tpu.models.sgat import sGAT

    samples, mols = _jax_samples(fixture_hdf5, FIXTURE_FEATS, "irmsd")
    net = sGAT(input_shape=samples[0].num_features)
    params = net.init(jax.random.PRNGKey(4))
    batch, _ = collate(samples)
    jout = np.asarray(net.apply(params, batch))

    tmodel = oracle.sGAT(samples[0].num_features)
    sd = {
        "conv1.weight": torch.tensor(np.asarray(params.conv1.weight)),
        "conv1.bias": torch.tensor(np.asarray(params.conv1.bias)),
        "conv2.weight": torch.tensor(np.asarray(params.conv2.weight)),
        "conv2.bias": torch.tensor(np.asarray(params.conv2.bias)),
        "fc1.weight": torch.tensor(np.asarray(params.fc1_w)),
        "fc1.bias": torch.tensor(np.asarray(params.fc1_b)),
        "fc2.weight": torch.tensor(np.asarray(params.fc2_w)),
        "fc2.bias": torch.tensor(np.asarray(params.fc2_b)),
    }
    tmodel.load_state_dict(sd)
    tbatch = _torch_batch(fixture_hdf5, mols, FIXTURE_FEATS, "irmsd")
    with torch.no_grad():
        tout = tmodel.eval()(tbatch).numpy()
    np.testing.assert_allclose(jout, tout, atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------------------
# Gradient parity (training-step correctness modulo optimizer numerics)
# ---------------------------------------------------------------------------

def test_ginet_gradient_parity(fixture_hdf5):
    import jax
    import jax.numpy as jnp

    from deeprank_gnn_tpu.data.batch import collate
    from deeprank_gnn_tpu.models.ginet import GINet

    samples, mols = _jax_samples(fixture_hdf5, FIXTURE_FEATS, "irmsd")
    net = GINet(input_shape=samples[0].num_features)
    params = net.init(jax.random.PRNGKey(11))
    batch, _ = collate(samples)

    def loss_fn(p):
        pred = net.apply(p, batch)[:, 0]
        return jnp.mean((pred - batch.y) ** 2)

    jgrads = jax.grad(loss_fn)(params)

    tmodel = _ginet_params_to_torch(
        oracle.GINet(samples[0].num_features), params
    ).eval()
    tbatch = _torch_batch(fixture_hdf5, mols, FIXTURE_FEATS, "irmsd")
    y = tbatch.y.clone()
    pred = tmodel(tbatch).reshape(-1)
    loss = torch.nn.functional.mse_loss(pred, y)
    loss.backward()

    tg = {k: v.grad for k, v in tmodel.named_parameters()}
    pairs = [
        (jgrads.fc1_w, tg["fc1.weight"]),
        (jgrads.fc1_b, tg["fc1.bias"]),
        (jgrads.fc2_w, tg["fc2.weight"]),
        (jgrads.fc2_b, tg["fc2.bias"]),
        (jgrads.conv1.fc_w, tg["conv1.fc.weight"]),
        (jgrads.conv2.fc_w, tg["conv2.fc.weight"]),
        (jgrads.conv1_ext.fc_w, tg["conv1_ext.fc.weight"]),
        (jgrads.conv2_ext.fc_w, tg["conv2_ext.fc.weight"]),
    ]
    for jg, tgv in pairs:
        np.testing.assert_allclose(
            np.asarray(jg), tgv.numpy(), atol=3e-5, rtol=3e-4
        )
    # Q1: the attention branch is dead — zero gradient on both sides
    for jg, key in [
        (jgrads.conv1.fc_att_w, "conv1.fc_attention.weight"),
        (jgrads.conv1.fc_edge_w, "conv1.fc_edge_attr.weight"),
    ]:
        assert float(np.abs(np.asarray(jg)).max()) == 0.0
        assert float(tg[key].abs().max()) == 0.0


# ---------------------------------------------------------------------------
# Pretrained paper checkpoints, end-to-end through NeuralNet.test()
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def generated_hdf5(tmp_path_factory):
    from deeprank_gnn_tpu.featurize.graphgen import GraphHDF5

    out = str(tmp_path_factory.mktemp("parity") / "1ATN_gen.hdf5")
    GraphHDF5(
        pdb_path="/root/reference/tests/data/pdb/1ATN",
        ref_path="/root/reference/tests/data/ref/1ATN",
        pssm_path="/root/reference/tests/data/pssm/1ATN",
        outfile=out,
        nproc=2,
    )
    return out


def test_fold6_pretrained_prediction_parity(generated_hdf5, tmp_path):
    from deeprank_gnn_tpu import NeuralNet
    from deeprank_gnn_tpu.models import GINet

    nn = NeuralNet(
        generated_hdf5, GINet, pretrained_model=FOLD6, outdir=str(tmp_path)
    )
    nn.test(threshold=0.3)  # PreCluster has now written mcl clusters
    jpred = np.asarray(nn.test_out)
    mols = list(nn.data["test"]["mol"])

    tmodel = _ginet_params_to_torch(oracle.GINet(48), nn.params).eval()
    tbatch = _torch_batch(generated_hdf5, mols, nn.node_feature, "fnat")
    with torch.no_grad():
        tout = tmodel(tbatch).reshape(-1).numpy()
    np.testing.assert_allclose(jpred, tout, atol=5e-5, rtol=5e-5)

    # rank parity (Spearman rho == 1.0): the scoring paper uses the
    # network to RANK docking models, so beyond elementwise closeness,
    # assert the orderings are identical. (The 10-graph residue fixture
    # cannot feed fold6 — it lacks the checkpoint's depth/hse features,
    # 26 vs 48 input dims — so ranking is asserted on the
    # featurizer-generated 1ATN docking models here.)
    assert (np.argsort(np.argsort(jpred)) == np.argsort(np.argsort(tout))).all()

    # single-graph batches give the same predictions (batch invariance)
    for i, mol in enumerate(mols):
        tb1 = _torch_batch(generated_hdf5, [mol], nn.node_feature, "fnat")
        with torch.no_grad():
            t1 = tmodel(tb1).reshape(-1).numpy()
        np.testing.assert_allclose(jpred[i], t1[0], atol=5e-5, rtol=5e-5)


def test_bio_classifier_prediction_parity(generated_hdf5, tmp_path):
    from deeprank_gnn_tpu import NeuralNet
    from deeprank_gnn_tpu.models import GINet

    nn = NeuralNet(
        generated_hdf5, GINet, pretrained_model=BIO, outdir=str(tmp_path)
    )
    nn.test(threshold=1)
    jcls = np.asarray(nn.test_out)
    jraw = np.asarray(nn.data["test"]["raw_outputs"])
    mols = list(nn.data["test"]["mol"])

    tmodel = _ginet_params_to_torch(
        oracle.GINet(20, output_shape=2), nn.params
    ).eval()
    tbatch = _torch_batch(generated_hdf5, mols, ["pssm"], None)
    with torch.no_grad():
        tlogits = tmodel(tbatch)
        traw = torch.softmax(tlogits, dim=1).numpy()
        tcls = tlogits.argmax(dim=1).numpy()
    np.testing.assert_array_equal(jcls, tcls)
    np.testing.assert_allclose(jraw, traw, atol=5e-5, rtol=5e-5)
