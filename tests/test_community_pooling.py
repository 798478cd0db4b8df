"""Community detection / pooling tests (mirrors reference
`tests/test_community_pooling.py`: 6-node two-triangle graph)."""

import numpy as np
import pytest

from deeprank_gnn_tpu.community_pooling import (
    community_detection,
    community_detection_per_batch,
    community_pooling,
    get_preloaded_cluster,
    graclus_cluster,
)


class Data:
    def __init__(self):
        self.edge_index = np.array(
            [[0, 1, 1, 2, 3, 4, 4, 5], [1, 0, 2, 1, 4, 3, 5, 4]]
        )
        self.x = np.array([[0.0], [1.0], [2.0], [3.0], [4.0], [5.0]])
        self.edge_attr = np.ones((8, 1))
        self.pos = np.random.rand(6, 3)
        self.batch = np.array([0, 0, 0, 1, 1, 1])


def test_detection_mcl():
    d = Data()
    c = community_detection(d.edge_index, 6, method="mcl")
    assert c.shape == (6,)
    # two triangles -> the two components get distinct labels
    assert len(set(c[:3]) & set(c[3:])) == 0


def test_detection_louvain():
    d = Data()
    c = community_detection(d.edge_index, 6, method="louvain")
    assert c.shape == (6,)
    assert len(set(c[:3]) & set(c[3:])) == 0


def test_detection_error():
    with pytest.raises(ValueError):
        community_detection(Data().edge_index, 6, method="xxx")


@pytest.mark.parametrize("method", ["mcl", "louvain"])
def test_detection_per_batch(method):
    d = Data()
    c = community_detection_per_batch(
        d.edge_index, d.batch, 6, method=method
    )
    assert c.shape == (6,)
    assert len(set(c[:3]) & set(c[3:])) == 0


def test_detection_per_batch_error():
    d = Data()
    with pytest.raises(ValueError):
        community_detection_per_batch(d.edge_index, d.batch, 6, method="xxxx")


def test_pooling():
    d = Data()
    cluster = community_detection(d.edge_index, 6)
    pooled = community_pooling(cluster, d)
    k = len(np.unique(cluster))
    assert pooled.x.shape[0] == k
    # max pooling of features
    for c in np.unique(cluster):
        members = d.x[cluster == c].max()
        assert members in pooled.x
    # no self loops in pooled edges
    if pooled.edge_index.size:
        assert (pooled.edge_index[0] != pooled.edge_index[1]).all()
    assert pooled.batch is not None and pooled.batch.shape == (k,)


def test_preloaded_cluster_offsets():
    cluster = np.array([0, 1, 0, 0, 1, 2])
    batch = np.array([0, 0, 0, 1, 1, 1])
    out = get_preloaded_cluster(cluster, batch)
    np.testing.assert_array_equal(out, [0, 1, 0, 2, 3, 4])
    # input not mutated (unlike the reference, quirk Q4)
    np.testing.assert_array_equal(cluster, [0, 1, 0, 0, 1, 2])


def test_graclus():
    d = Data()
    c = graclus_cluster(d.edge_index, 6)
    assert c.shape == (6,)
    # matching: every cluster has size 1 or 2
    _, counts = np.unique(c, return_counts=True)
    assert (counts <= 2).all()


def test_mcl_exact_parity_with_fixture():
    """Our from-scratch MCL reproduces the `markov_clustering` output
    stored in the reference fixture (`clustering/mcl/depth_{0,1}`)
    bit-exactly for all 10 graphs — both clustering depths, including
    the full two-stage pipeline (depth_0 -> pooled graph -> depth_1),
    matching reference `DataSet.py:78-86` + `community_pooling.py:142-155`."""
    import h5py

    from deeprank_gnn_tpu.featurize.cluster import (
        community_detection,
        pool_graph_host,
    )

    with h5py.File("/root/reference/tests/hdf5/1ATN_residue.hdf5", "r") as f:
        assert len(f.keys()) == 10
        for mol in f.keys():
            grp = f[mol]
            n = grp["node_data/pos"].shape[0]
            ind = grp["internal_edge_index"][()]
            iei = np.vstack((ind, np.flip(ind, 1))).T  # loader doubling
            d0_ref = grp["clustering/mcl/depth_0"][()]
            d1_ref = grp["clustering/mcl/depth_1"][()]
            d0 = community_detection(iei, n, "mcl")
            np.testing.assert_array_equal(d0, d0_ref, err_msg=f"{mol} depth_0")
            pooled_iei, n_pooled = pool_graph_host(d0, iei)
            d1 = community_detection(pooled_iei, n_pooled, "mcl")
            np.testing.assert_array_equal(d1, d1_ref, err_msg=f"{mol} depth_1")
