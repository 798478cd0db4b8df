"""Residue depth and half-sphere exposure — from-scratch replacements
for the reference's Biopython/msms wrappers (`tools/BioWrappers.py`).

- **Residue depth** (Chakravarty & Varadarajan 1999): mean distance of
  a residue's atoms to the solvent-accessible surface. The reference
  shells out to the `msms` binary via Biopython
  (`BioWrappers.py:32-70`); here the surface is sampled directly from
  the Shrake-Rupley accessible points, no external binary.
- **Half-sphere exposure** (Hamelryck 2005), CA-based: neighbors'
  CA atoms within 13 A are split by the plane normal to the
  pseudo-CB direction derived from CA(i-1), CA(i), CA(i+1)
  (`BioWrappers.py:72-94` wraps Biopython's HSExposureCA). Returns
  (hse_up, hse_down, angle) triples.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
from scipy.spatial import cKDTree

from deeprank_gnn_tpu.featurize.pdb import Structure
from deeprank_gnn_tpu.featurize.sasa import (
    PROBE_RADIUS,
    VDW_RADII,
    _fibonacci_sphere,
)

ResKey = Tuple[str, int, str]
HSE_RADIUS = 13.0


def get_bio_model(pdbfile):
    """Load a structure (reference `BioWrappers.get_bio_model`,
    `BioWrappers.py:18-29` — there it returns a Biopython model; here
    the parsed :class:`Structure` plays that role)."""
    from deeprank_gnn_tpu.featurize.pdb import read_pdb

    return read_pdb(pdbfile)


def surface_points(struct: Structure, n_points: int = 60) -> np.ndarray:
    """Sample the solvent-accessible surface: per-atom sphere points not
    buried in any neighbor sphere."""
    radii = np.array(
        [VDW_RADII.get(e, 1.80) for e in struct.element], dtype=np.float64
    ) + PROBE_RADIUS
    xyz = struct.xyz
    sphere = _fibonacci_sphere(n_points)
    tree = cKDTree(xyz)
    max_r = radii.max()
    keep: List[np.ndarray] = []
    neighbor_lists = tree.query_ball_point(xyz, radii + max_r)
    for i in range(struct.natoms):
        nbrs = [j for j in neighbor_lists[i] if j != i]
        pts = xyz[i] + radii[i] * sphere
        if nbrs:
            nb_xyz = xyz[nbrs]
            nb_r = radii[nbrs]
            d2 = ((pts[:, None, :] - nb_xyz[None, :, :]) ** 2).sum(-1)
            buried = (d2 < (nb_r ** 2)[None, :]).any(axis=1)
            pts = pts[~buried]
        if len(pts):
            keep.append(pts)
    return np.concatenate(keep, axis=0)


def get_depth_res(struct: Structure) -> Dict[Tuple[str, int], float]:
    """Mean residue-atom distance to the surface, per (chain, resSeq)."""
    surf = surface_points(struct)
    tree = cKDTree(surf)
    dist, _ = tree.query(struct.xyz)
    out: Dict[Tuple[str, int], float] = {}
    for key, idx in struct.residue_atoms().items():
        out[key] = float(dist[idx].mean())
    return out


def get_depth_contact_res(
    struct: Structure, nodes
) -> Dict[ResKey, float]:
    """Depth restricted to the given contact residues
    (`BioWrappers.py:52-70`)."""
    depth = get_depth_res(struct)
    return {n: depth.get((n[0], n[1]), 0.0) for n in nodes}


def get_hse(struct: Structure) -> Dict[Tuple[str, int], Tuple[float, float, float]]:
    """CA-based half-sphere exposure per (chain, resSeq)."""
    # CA trace per chain, in residue order
    out: Dict[Tuple[str, int], Tuple[float, float, float]] = {}
    ca_mask = struct.name == "CA"
    ca_xyz_all = struct.xyz[ca_mask]
    if len(ca_xyz_all) == 0:
        return out
    ca_tree = cKDTree(ca_xyz_all)
    chains = struct.chain[ca_mask]
    resseqs = struct.resseq[ca_mask]
    for chain in np.unique(chains):
        m = chains == chain
        order = np.argsort(resseqs[m], kind="stable")
        seqs = resseqs[m][order]
        coords = ca_xyz_all[m][order]
        for i in range(len(seqs)):
            if i == 0 or i == len(seqs) - 1:
                continue
            ca_prev, ca, ca_next = coords[i - 1], coords[i], coords[i + 1]
            d1 = ca_prev - ca
            d2 = ca_next - ca
            n1 = np.linalg.norm(d1)
            n2 = np.linalg.norm(d2)
            if n1 < 1e-6 or n2 < 1e-6:
                continue
            # pseudo-CB direction: bisector of the two CA-CA bonds,
            # pointing away from the backbone
            cb_dir = -(d1 / n1 + d2 / n2)
            norm = np.linalg.norm(cb_dir)
            if norm < 1e-6:
                continue
            cb_dir /= norm
            nbrs = ca_tree.query_ball_point(ca, HSE_RADIUS)
            up = down = 0
            for j in nbrs:
                vec = ca_xyz_all[j] - ca
                if np.linalg.norm(vec) < 1e-6:
                    continue
                if np.dot(vec, cb_dir) > 0:
                    up += 1
                else:
                    down += 1
            angle = float(np.arccos(np.clip(np.dot(d1 / n1, d2 / n2), -1, 1)))
            out[(str(chain), int(seqs[i]))] = (float(up), float(down), angle)
    return out
