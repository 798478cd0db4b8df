"""Solvent-accessible surface area (SASA) — from-scratch Shrake-Rupley.

Replaces the freesasa C library the reference wraps for its buried-
surface-area node feature (`tools/BSA.py:6,55-117`): the BSA of a
contact residue is SASA(residue in its isolated chain) minus
SASA(residue in the complex) (`BSA.py:96-108`).

Implementation: Shrake & Rupley (1973) — sample each atom's solvent
sphere (vdW radius + 1.4 A probe) with a Fibonacci point set and count
points not buried inside any neighbor's sphere; neighbor search via
cKDTree. Values agree with freesasa's Lee-Richards defaults to within
a few percent, which is well inside the feature's useful resolution
(the fixture's bsa values span ~0-200 A^2).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
from scipy.spatial import cKDTree

from deeprank_gnn_tpu.featurize.pdb import Structure

# ProtOr-ish van der Waals radii by element (A). Unknown -> 1.80.
VDW_RADII = {
    "H": 1.10,
    "C": 1.70,
    "N": 1.55,
    "O": 1.52,
    "S": 1.80,
    "P": 1.80,
    "SE": 1.90,
    "FE": 2.00,
    "ZN": 1.39,
    "MG": 1.73,
}
PROBE_RADIUS = 1.4
DEFAULT_N_POINTS = 100


def _fibonacci_sphere(n: int) -> np.ndarray:
    """n quasi-uniform points on the unit sphere."""
    i = np.arange(n, dtype=np.float64)
    phi = np.pi * (3.0 - np.sqrt(5.0))  # golden angle
    y = 1.0 - 2.0 * (i + 0.5) / n
    r = np.sqrt(np.maximum(0.0, 1.0 - y * y))
    theta = phi * i
    return np.stack([r * np.cos(theta), y, r * np.sin(theta)], axis=1)


def atom_sasa(
    struct: Structure, n_points: int = DEFAULT_N_POINTS
) -> np.ndarray:
    """Per-atom SASA [natoms] in A^2.

    Uses the native C++ kernel (native/fastpath.cpp `sasa_compute`,
    spatial-grid neighbor search) when available — ~100x the numpy
    loop — with identical sampling, so results match exactly."""
    radii = np.array(
        [VDW_RADII.get(e, 1.80) for e in struct.element], dtype=np.float64
    )
    radii = radii + PROBE_RADIUS
    xyz = struct.xyz
    n = struct.natoms

    from deeprank_gnn_tpu.native import sasa_native

    native = sasa_native(xyz, radii, n_points)
    if native is not None:
        return native
    sphere = _fibonacci_sphere(n_points)

    tree = cKDTree(xyz)
    max_r = radii.max()
    out = np.zeros(n)
    # neighbors within r_i + max radius can bury points of atom i
    neighbor_lists = tree.query_ball_point(xyz, radii + max_r)
    for i in range(n):
        nbrs = [j for j in neighbor_lists[i] if j != i]
        pts = xyz[i] + radii[i] * sphere  # [P, 3]
        if nbrs:
            nb_xyz = xyz[nbrs]  # [M, 3]
            nb_r = radii[nbrs]  # [M]
            d2 = ((pts[:, None, :] - nb_xyz[None, :, :]) ** 2).sum(-1)
            buried = (d2 < (nb_r ** 2)[None, :]).any(axis=1)
            accessible = int((~buried).sum())
        else:
            accessible = n_points
        out[i] = 4.0 * np.pi * radii[i] ** 2 * accessible / n_points
    return out


def residue_sasa(
    struct: Structure, n_points: int = DEFAULT_N_POINTS
) -> Dict[Tuple[str, int], float]:
    """Per-residue SASA: sum of member atom SASAs."""
    per_atom = atom_sasa(struct, n_points)
    out: Dict[Tuple[str, int], float] = {}
    for key, idx in struct.residue_atoms().items():
        out[key] = float(per_atom[idx].sum())
    return out


def buried_surface_area(
    struct: Structure,
    residues,
    n_points: int = DEFAULT_N_POINTS,
    complex_sasa: "Dict | None" = None,
    chain_sasa: "Dict | None" = None,
) -> Dict[Tuple[str, int, str], float]:
    """BSA per contact residue: SASA(unbound chain) - SASA(complex)
    (`tools/BSA.py:84-117` semantics).

    Args:
        struct: the full complex.
        residues: iterable of (chain, resSeq, resName) contact residues.
        complex_sasa / chain_sasa: optionally precomputed per-residue
            SASA maps (see :class:`featurize.bsa.BSA`) — SASA dominates
            featurization cost, so callers that already hold them
            shouldn't pay twice.
    """
    if complex_sasa is None:
        complex_sasa = residue_sasa(struct, n_points)
    if chain_sasa is None:
        chain_sasa = {}
    for chain in sorted(set(r[0] for r in residues)):
        if chain not in chain_sasa:
            sub = struct.select(struct.chain == chain)
            chain_sasa[chain] = residue_sasa(sub, n_points)
    out = {}
    for res in residues:
        key = (res[0], res[1])
        asa_unbound = chain_sasa[res[0]].get(key, 0.0)
        asa_complex = complex_sasa.get(key, 0.0)
        out[res] = asa_unbound - asa_complex
    return out
