"""Engine feature-matrix contract (VERDICT r3 weak #5 / item 10).

Every advertised combination of (layout, device_cache, scan_epochs,
mesh) must either TRAIN or raise a documented ValueError at
construction — never crash mid-train, never silently fall into an
unsupported mode. This enumerates the full 54-cell matrix: the valid
cells run one epoch end-to-end, the invalid cells assert their error.

The two product configurations (docs/migration.md):
  - single-host mesh: layout='dense', device_cache=True,
    scan_epochs=True|'full' (+ mesh) — the fast path
  - multi-host / beyond-HBM: streaming loaders or the rotating
    'chunked' store.
"""

import itertools

import numpy as np
import pytest

import jax

from deeprank_gnn_tpu.models import GINet
from deeprank_gnn_tpu.train.neuralnet import NeuralNet

NODE_FEATS = ["type", "polarity", "bsa"]

LAYOUTS = ("sparse", "dense", "halo")
CACHES = (False, True, "chunked")
SCANS = (False, True, "full")
MESHES = (None, "mesh4")


def _expected_error(layout, cache, scan, mesh):
    """The documented constructor constraint a cell violates, if any
    (mirrors the error ladder in NeuralNet.__init__)."""
    if cache and layout != "dense":
        return "device_cache requires layout='dense'"
    if cache == "chunked" and mesh is not None and not scan:
        # chunked composes with a mesh ONLY through the scanned path
        # (replicated per-chunk uploads; round-5 cell)
        return "chunked.*scan_epochs"
    if scan and not cache:
        return "scan_epochs requires device_cache"
    if scan == "full" and cache is not True:
        return "scan_epochs='full' requires the in-HBM store"
    return None


def _cells():
    for layout, cache, scan, mesh in itertools.product(
        LAYOUTS, CACHES, SCANS, MESHES
    ):
        yield layout, cache, scan, mesh


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
@pytest.mark.parametrize(
    "layout,cache,scan,mesh",
    list(_cells()),
    ids=lambda v: str(v),
)
def test_flag_matrix_cell(fixture_hdf5, tmp_path, layout, cache, scan, mesh):
    from deeprank_gnn_tpu.parallel import make_mesh

    mesh_obj = None
    if mesh == "mesh4":
        if layout == "halo":
            from deeprank_gnn_tpu.parallel.halo import make_halo_mesh

            mesh_obj = make_halo_mesh(jax.devices()[:4])
        else:
            mesh_obj = make_mesh(jax.devices()[:4], dp=4, ep=1)

    kw = dict(
        Net=GINet,
        node_feature=NODE_FEATS,
        target="irmsd",
        batch_size=4,
        percent=(1.0, 0.0),
        shuffle=False,
        outdir=str(tmp_path),
        layout=layout,
        device_cache=cache,
        scan_epochs=scan,
        mesh=mesh_obj,
    )
    err = _expected_error(layout, cache, scan, mesh)
    if err is not None:
        with pytest.raises(ValueError, match=err):
            NeuralNet(str(fixture_hdf5), **kw)
        return
    nn = NeuralNet(str(fixture_hdf5), **kw)
    nn.train(nepoch=1)
    assert len(nn.train_loss) == 1
    assert np.isfinite(nn.train_loss).all()
