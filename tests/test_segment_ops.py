"""Golden tests for segment ops vs hand-rolled numpy references that
encode torch-scatter semantics (reference `ginet.py:69-71`,
`sGAT.py:79-81`, `community_pooling.py:201,214`)."""

import numpy as np
import jax.numpy as jnp
import pytest

from deeprank_gnn_tpu.ops import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
    coalesce_edges,
)


def np_scatter_sum(data, ids, n):
    out = np.zeros((n,) + data.shape[1:], dtype=data.dtype)
    for i, s in enumerate(ids):
        if 0 <= s < n:
            out[s] += data[i]
    return out


def np_scatter_mean(data, ids, n):
    total = np_scatter_sum(data, ids, n)
    count = np_scatter_sum(np.ones((len(ids), 1), np.float32), ids, n)[:, 0]
    return total / np.maximum(count, 1)[:, None]


def np_scatter_max(data, ids, n):
    out = np.zeros((n,) + data.shape[1:], dtype=data.dtype)
    seen = np.zeros(n, bool)
    for i, s in enumerate(ids):
        if 0 <= s < n:
            out[s] = np.maximum(out[s], data[i]) if seen[s] else data[i]
            seen[s] = True
    return out


@pytest.fixture()
def rand():
    rng = np.random.RandomState(0)
    e, n, f = 97, 13, 5
    data = rng.randn(e, f).astype(np.float32)
    ids = rng.randint(0, n + 1, size=e)  # includes padding index n
    return data, ids, n


def test_segment_sum(rand):
    data, ids, n = rand
    got = segment_sum(jnp.asarray(data), jnp.asarray(ids), n)
    np.testing.assert_allclose(got, np_scatter_sum(data, ids, n), rtol=1e-5)


def test_segment_mean(rand):
    data, ids, n = rand
    got = segment_mean(jnp.asarray(data), jnp.asarray(ids), n)
    np.testing.assert_allclose(got, np_scatter_mean(data, ids, n), rtol=1e-5)


def test_segment_max(rand):
    data, ids, n = rand
    got = segment_max(jnp.asarray(data), jnp.asarray(ids), n)
    np.testing.assert_allclose(got, np_scatter_max(data, ids, n), rtol=1e-5)


def test_segment_max_empty_is_zero():
    data = jnp.ones((2, 3)) * -5.0
    got = segment_max(data, jnp.array([0, 0]), 3)
    np.testing.assert_allclose(got[1:], 0.0)
    np.testing.assert_allclose(got[0], -5.0)


def test_segment_softmax_matches_dense():
    rng = np.random.RandomState(1)
    logits = rng.randn(10).astype(np.float32)
    ids = np.array([0, 0, 0, 1, 1, 2, 2, 2, 2, 3])
    got = np.asarray(segment_softmax(jnp.asarray(logits), jnp.asarray(ids), 4))
    for s in range(4):
        sel = ids == s
        ref = np.exp(logits[sel] - logits[sel].max())
        ref /= ref.sum()
        np.testing.assert_allclose(got[sel], ref, rtol=1e-5)


def test_coalesce_dedup_and_selfloop():
    # edges: (0,1) x2 (dup), (1,0), (2,2) selfloop, one padded lane
    edge_index = jnp.array([[0, 0, 1, 2, 4], [1, 1, 0, 2, 4]], dtype=jnp.int32)
    attr = jnp.array([[1.0], [2.0], [3.0], [4.0], [9.0]])
    mask = jnp.array([True, True, True, True, False])
    new_index, new_attr, new_mask = coalesce_edges(edge_index, attr, mask, 4)
    assert int(new_mask.sum()) == 2
    # sorted by (src, dst): (0,1) then (1,0)
    np.testing.assert_array_equal(np.asarray(new_index[:, :2]), [[0, 1], [1, 0]])
    np.testing.assert_allclose(np.asarray(new_attr[:2, 0]), [3.0, 3.0])


def test_coalesce_gradient_flows():
    import jax

    edge_index = jnp.array([[0, 0, 1], [1, 1, 0]], dtype=jnp.int32)
    mask = jnp.array([True, True, True])

    def f(attr):
        _, new_attr, _ = coalesce_edges(edge_index, attr, mask, 2)
        return jnp.sum(new_attr ** 2)

    attr = jnp.array([[1.0], [2.0], [3.0]])
    g = jax.grad(f)(attr)
    # d/dattr of ((a0+a1)^2 + a2^2): [2*3, 2*3, 2*3]
    np.testing.assert_allclose(np.asarray(g[:, 0]), [6.0, 6.0, 6.0])
