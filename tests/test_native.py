"""Native C++ fastpath kernels must match the numpy reference paths."""

import time

import numpy as np
import pytest

from deeprank_gnn_tpu import native

PDB1 = "/root/reference/tests/data/pdb/1ATN/1ATN_1w.pdb"


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def test_sasa_native_matches_numpy(lib):
    from deeprank_gnn_tpu.featurize import sasa as sasa_mod
    from deeprank_gnn_tpu.featurize.pdb import read_pdb

    s = read_pdb(PDB1)
    sub = s.select(s.chain == "B")
    radii = (
        np.array([sasa_mod.VDW_RADII.get(e, 1.8) for e in sub.element])
        + sasa_mod.PROBE_RADIUS
    )
    got = native.sasa_native(sub.xyz, radii, 50)
    # numpy reference path (bypass native)
    sphere = sasa_mod._fibonacci_sphere(50)
    from scipy.spatial import cKDTree

    tree = cKDTree(sub.xyz)
    want = np.zeros(sub.natoms)
    nl = tree.query_ball_point(sub.xyz, radii + radii.max())
    for i in range(sub.natoms):
        nbrs = [j for j in nl[i] if j != i]
        pts = sub.xyz[i] + radii[i] * sphere
        if nbrs:
            d2 = ((pts[:, None, :] - sub.xyz[nbrs][None]) ** 2).sum(-1)
            buried = (d2 < (radii[nbrs] ** 2)[None, :]).any(axis=1)
            acc = int((~buried).sum())
        else:
            acc = 50
        want[i] = 4 * np.pi * radii[i] ** 2 * acc / 50
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_contacts_native_matches_scipy(lib):
    rng = np.random.RandomState(0)
    xyz_a = rng.rand(500, 3) * 30
    xyz_b = rng.rand(400, 3) * 30 + 5
    rid_a = rng.randint(0, 40, 500).astype(np.int64)
    rid_b = rng.randint(0, 35, 400).astype(np.int64)
    got = native.contact_pairs_native(xyz_a, rid_a, xyz_b, rid_b, 4.0)
    assert got is not None
    res_a, res_b, dist = got
    # scipy reference
    from scipy.spatial import cKDTree

    coo = cKDTree(xyz_a).sparse_distance_matrix(
        cKDTree(xyz_b), 4.0, output_type="coo_matrix"
    )
    want = {}
    for r, c, d in zip(rid_a[coo.row], rid_b[coo.col], coo.data):
        k = (int(r), int(c))
        want[k] = min(want.get(k, 1e9), float(d))
    got_d = {(int(a), int(b)): float(d) for a, b, d in zip(res_a, res_b, dist)}
    assert set(got_d) == set(want)
    for k in want:
        np.testing.assert_allclose(got_d[k], want[k], rtol=1e-9)


def test_coalesce_native_matches_numpy(lib):
    rng = np.random.RandomState(1)
    src = rng.randint(0, 50, 2000).astype(np.int32)
    dst = rng.randint(0, 50, 2000).astype(np.int32)
    usrc, udst, inverse = native.coalesce_pairs_native(src, dst)
    uniq, inv = np.unique(np.stack([src, dst]).T, axis=0, return_inverse=True)
    np.testing.assert_array_equal(usrc, uniq[:, 0])
    np.testing.assert_array_equal(udst, uniq[:, 1])
    np.testing.assert_array_equal(inverse, inv.astype(np.int32))


def test_sasa_native_speedup(lib):
    """The native SASA should be dramatically faster than the python
    loop — this is the featurizer's dominant cost."""
    from deeprank_gnn_tpu.featurize import sasa as sasa_mod
    from deeprank_gnn_tpu.featurize.pdb import read_pdb

    s = read_pdb(PDB1)
    radii = (
        np.array([sasa_mod.VDW_RADII.get(e, 1.8) for e in s.element])
        + sasa_mod.PROBE_RADIUS
    )
    t0 = time.perf_counter()
    native.sasa_native(s.xyz, radii, 100)
    t_native = time.perf_counter() - t0
    assert t_native < 1.0  # 6003 atoms; python loop takes multiple seconds
