"""Golden-value model tests.

A direct numpy transliteration of the reference model math (documented
in SURVEY.md §2.2 from `ginet.py:50-141`, `foutnet.py:56-126`,
`sGAT.py:62-139`, `community_pooling.py:161-251`) is evaluated on a
single unpadded fixture graph and compared against the framework's
padded, batched, jitted forward — proving that padding, host-side
pooling plans and segment kernels reproduce the reference numerics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deeprank_gnn_tpu.data import HDF5DataSet, collate
from deeprank_gnn_tpu.models import GINet, FoutNet, sGAT

NODE_FEATS = ["type", "polarity", "bsa", "depth", "hse", "ic", "pssm"]


@pytest.fixture(scope="module")
def graphs():
    ds = HDF5DataSet(
        database="/root/reference/tests/hdf5/1ATN_residue.hdf5",
        node_feature=NODE_FEATS,
        edge_feature=["dist"],
        target="irmsd",
        tqdm=False,
    )
    return [ds.get(i) for i in range(3)]


# ---------------------------------------------------------------------------
# numpy reference implementations (single graph, no padding)


def np_scatter_sum(data, ids, n):
    out = np.zeros((n,) + data.shape[1:], dtype=np.float64)
    np.add.at(out, ids, data)
    return out


def np_scatter_mean(data, ids, n):
    s = np_scatter_sum(data, ids, n)
    c = np.zeros(n)
    np.add.at(c, ids, 1.0)
    return s / np.maximum(c, 1)[:, None]


def np_scatter_max(data, ids, n):
    out = np.full((n,) + data.shape[1:], -np.inf)
    np.maximum.at(out, ids, data)
    out[np.isinf(out)] = 0.0
    return out


def np_consecutive(cluster):
    uniq, inv = np.unique(cluster, return_inverse=True)
    return inv, len(uniq)


def np_pool_edges(cluster, edge_index, edge_attr):
    """PyG pool_edge: map, drop self loops, coalesce (sorted, attr-sum)."""
    mapped = cluster[edge_index]
    keep = mapped[0] != mapped[1]
    mapped = mapped[:, keep]
    attr = edge_attr[keep]
    uniq, inv = np.unique(mapped.T, axis=0, return_inverse=True)
    pooled_attr = np.zeros((len(uniq), attr.shape[1]))
    np.add.at(pooled_attr, inv, attr)
    return uniq.T, pooled_attr


def np_ginet_conv(p, x, edge_index, edge_attr):
    row, col = edge_index
    xw = x @ np.asarray(p.fc_w).T
    # Q1: softmaxed scalar attention == 1
    return np_scatter_sum(xw[col], row, x.shape[0])


def np_ginet_forward(params, model, x, edge_index, edge_attr, c0, c1):
    def tower(conv1, conv2):
        h = np.maximum(np_ginet_conv(conv1, x, edge_index, edge_attr), 0)
        a0, k0 = np_consecutive(c0)
        hp = np_scatter_max(h, a0, k0)
        pe_index, pe_attr = np_pool_edges(a0, edge_index, edge_attr)
        h2 = np.maximum(np_ginet_conv(conv2, hp, pe_index, pe_attr), 0)
        a1, k1 = np_consecutive(c1)
        hq = np_scatter_max(h2, a1, k1)
        return hq.mean(axis=0, keepdims=True)  # scatter_mean over 1 graph

    t1 = tower(params.conv1, params.conv2)
    t2 = tower(params.conv1_ext, params.conv2_ext)
    h = np.concatenate([t1, t2], axis=1)
    h = np.maximum(h @ np.asarray(params.fc1_w).T + np.asarray(params.fc1_b), 0)
    return h @ np.asarray(params.fc2_w).T + np.asarray(params.fc2_b)


def np_fout_layer(p, x, edge_index):
    row, col = edge_index
    alpha = x @ np.asarray(p.wc)
    beta = x @ np.asarray(p.wn)
    gamma = np.zeros_like(alpha)
    for node in range(x.shape[0]):
        nb = col[row == node]
        if len(nb):
            gamma[node] = beta[nb].mean(axis=0)
    return alpha + gamma + np.asarray(p.bias)


def np_single_tower_forward(layer_fn, params, x, edge_index, edge_attr, c0, c1):
    h = np.maximum(layer_fn(params.conv1, x, edge_index, edge_attr), 0)
    a0, k0 = np_consecutive(c0)
    hp = np_scatter_max(h, a0, k0)
    pe_index, pe_attr = np_pool_edges(a0, edge_index, edge_attr)
    h2 = np.maximum(layer_fn(params.conv2, hp, pe_index, pe_attr), 0)
    a1, k1 = np_consecutive(c1)
    hq = np_scatter_max(h2, a1, k1)
    out = hq.mean(axis=0, keepdims=True)
    out = np.maximum(out @ np.asarray(params.fc1_w).T + np.asarray(params.fc1_b), 0)
    return out @ np.asarray(params.fc2_w).T + np.asarray(params.fc2_b)


def np_sgat_layer(p, x, edge_index, edge_attr):
    row, col = edge_index
    w = np.asarray(p.weight)
    alpha = np.concatenate([x[row], x[col]], axis=1) @ w
    alpha = edge_attr * alpha
    return np_scatter_mean(alpha, row, x.shape[0]) + np.asarray(p.bias)


# ---------------------------------------------------------------------------


def run_batched(model, params, graphs):
    batch, mols = collate(graphs)
    return np.asarray(model.apply(params, batch))[: len(graphs)]


def run_golden(np_forward, params, graphs):
    outs = []
    for s in graphs:
        outs.append(
            np_forward(
                params,
                s.x.astype(np.float64),
                s.edge_index,
                s.edge_attr.astype(np.float64),
                s.cluster0,
                s.cluster1,
            )[0]
        )
    return np.stack(outs)


def test_ginet_forward_matches_golden(graphs):
    model = GINet(graphs[0].num_features, 1, 1)
    params = model.init(jax.random.PRNGKey(42))
    got = run_batched(model, params, graphs)
    want = run_golden(
        lambda p, x, ei, ea, c0, c1: np_ginet_forward(p, model, x, ei, ea, c0, c1),
        params,
        graphs,
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_foutnet_forward_matches_golden(graphs):
    model = FoutNet(graphs[0].num_features, 1)
    params = model.init(jax.random.PRNGKey(43))
    got = run_batched(model, params, graphs)

    def fwd(p, x, ei, ea, c0, c1):
        return np_single_tower_forward(
            lambda lp, xx, eei, eea: np_fout_layer(lp, xx, eei), p, x, ei, ea, c0, c1
        )

    want = run_golden(fwd, params, graphs)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_sgat_forward_matches_golden(graphs):
    model = sGAT(graphs[0].num_features, 1)
    params = model.init(jax.random.PRNGKey(44))
    got = run_batched(model, params, graphs)
    want = run_golden(
        lambda p, x, ei, ea, c0, c1: np_single_tower_forward(
            np_sgat_layer, p, x, ei, ea, c0, c1
        ),
        params,
        graphs,
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_ginet_gradients_flow(graphs):
    """The attention branch must receive exactly zero gradient (Q1) and
    the fc/conv weights a nonzero one."""
    model = GINet(graphs[0].num_features, 1, 1)
    params = model.init(jax.random.PRNGKey(0))
    batch, _ = collate(graphs)

    def loss(p):
        pred = model.apply(p, batch).reshape(-1)[: len(graphs)]
        return jnp.sum(pred ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g.conv1.fc_w).sum()) > 0
    assert float(jnp.abs(g.fc1_w).sum()) > 0
    assert float(jnp.abs(g.conv1.fc_att_w).sum()) == 0.0
    assert float(jnp.abs(g.conv1.fc_edge_w).sum()) == 0.0


def test_ginet_internal_tower(graphs):
    """The docs-variant wiring (second tower on internal edges,
    reference docs/tutorial.advanced.rst:127-138) must differ from the
    shipped-code parity wiring and match a numpy transliteration."""
    model = GINet(graphs[0].num_features, 1, 1, internal_tower=True)
    model_q2 = GINet(graphs[0].num_features, 1, 1)
    params = model.init(jax.random.PRNGKey(5))
    got = run_batched(model, params, graphs)
    got_q2 = run_batched(model_q2, params, graphs)
    assert not np.allclose(got, got_q2)

    def np_forward(params, x, ei, ea, iei, iea, c0, c1):
        def tower(conv1, conv2, e_index, e_attr):
            h = np.maximum(np_ginet_conv(conv1, x, e_index, e_attr), 0)
            a0, k0 = np_consecutive(c0)
            hp = np_scatter_max(h, a0, k0)
            p_index, p_attr = np_pool_edges(a0, e_index, e_attr)
            h2 = np.maximum(np_ginet_conv(conv2, hp, p_index, p_attr), 0)
            a1, k1 = np_consecutive(c1)
            return np_scatter_max(h2, a1, k1).mean(axis=0, keepdims=True)

        t1 = tower(params.conv1, params.conv2, ei, ea)
        t2 = tower(params.conv1_ext, params.conv2_ext, iei, iea)
        h = np.concatenate([t1, t2], axis=1)
        h = np.maximum(h @ np.asarray(params.fc1_w).T + np.asarray(params.fc1_b), 0)
        return h @ np.asarray(params.fc2_w).T + np.asarray(params.fc2_b)

    want = np.stack(
        [
            np_forward(
                params,
                s.x.astype(np.float64),
                s.edge_index,
                s.edge_attr.astype(np.float64),
                s.internal_edge_index,
                s.internal_edge_attr.astype(np.float64),
                s.cluster0,
                s.cluster1,
            )[0]
            for s in graphs
        ]
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
