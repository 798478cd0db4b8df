"""Batch PDB -> HDF5 graph generation driver (reference `GraphGenMP.py`).

Serial or process-pool parallel; workers featurize + score independent
PDBs and the parent merges results into one HDF5 file. Unlike the
reference (which pickles whole graphs to a tmpdir and re-reads them,
`GraphGenMP.py:84-112`), workers return graphs through the pool
directly.
"""

from __future__ import annotations

import glob
import multiprocessing as mp
import os
from functools import partial
from typing import Dict, List, Optional

import h5py

from deeprank_gnn_tpu.featurize.residue_graph import ResidueGraph

_GRAPH_CLASSES = {"residue": ResidueGraph}


def _graph_class(graph_type: str):
    if graph_type == "atomic":
        # lazy: atomic graphs are an extension beyond the residue-only
        # reference (`GraphGenMP.py:24` takes graph_type but only
        # implements 'residue')
        from deeprank_gnn_tpu.featurize.atom_graph import AtomGraph

        return AtomGraph
    try:
        return _GRAPH_CLASSES[graph_type]
    except KeyError:
        raise ValueError(
            f"unknown graph_type {graph_type!r}; use 'residue' or 'atomic'"
        ) from None


def _build_one(
    name: str,
    pssm: Dict[str, Optional[Dict[str, str]]],
    ref: Optional[str],
    biopython: bool,
    graph_type: str = "residue",
):
    cls = _graph_class(graph_type)
    g = cls(pdb=name, pssm=pssm[name], biopython=biopython)
    if ref is not None:
        g.get_score(ref)
    # drop the parsed structure before crossing the process boundary
    g.struct = None
    return g


def _build_one_safe(name, pssm, ref, biopython, graph_type="residue"):
    """Worker wrapper: one bad PDB must not abort the whole pool run
    (an exception raised inside pool.map kills every result)."""
    try:
        return _build_one(name, pssm, ref, biopython, graph_type)
    except Exception as e:
        print("Issue encountered while computing graph ", name)
        print(e)
        return None


class GraphHDF5:
    def __init__(
        self,
        pdb_path: str,
        ref_path: Optional[str] = None,
        graph_type: str = "residue",
        pssm_path: Optional[str] = None,
        select: Optional[str] = None,
        outfile: str = "graph.hdf5",
        nproc: int = 1,
        use_tqdm: bool = True,
        tmpdir: str = "./",
        limit=None,
        biopython: bool = False,
    ):
        pdbs = [f for f in os.listdir(pdb_path) if f.endswith(".pdb")]
        if select is not None:
            pdbs = [f for f in pdbs if f.startswith(select)]
        pdbs = sorted(os.path.join(pdb_path, name) for name in pdbs)
        if limit is not None:
            pdbs = pdbs[limit[0] : limit[1]] if isinstance(limit, list) else pdbs[:limit]

        base_name = None
        pssm: Dict[str, Optional[Dict[str, str]]] = {}
        for p in pdbs:
            mol_name = os.path.splitext(os.path.basename(p))[0]
            base_name = mol_name.split("_")[0]
            pssm[p] = (
                self._get_pssm(pssm_path, mol_name, base_name)
                if pssm_path is not None
                else None
            )

        ref = (
            None
            if ref_path is None
            else self._find_ref(ref_path, base_name)
        )

        _graph_class(graph_type)  # validate before any work
        graphs: List[ResidueGraph] = []
        if nproc == 1:
            for name in pdbs:
                try:
                    graphs.append(
                        _build_one(name, pssm, ref, biopython, graph_type)
                    )
                except Exception as e:
                    print("Issue encountered while computing graph ", name)
                    print(e)
        else:
            # fork, deliberately: spawn/forkserver re-import the user's
            # __main__ script, and (as in the reference's example
            # scripts) graph-generation scripts typically have no
            # __main__ guard -> recursive pool creation. Workers are
            # pure-host featurizers (numpy/scipy/h5py only) and never
            # touch the forked jax/XLA state. JAX_PLATFORMS is pinned
            # to cpu around the fork so any accidental jax use in a
            # worker cannot attach to the (single) TPU runtime.
            saved = os.environ.get("JAX_PLATFORMS")
            os.environ["JAX_PLATFORMS"] = "cpu"
            try:
                with mp.get_context("fork").Pool(nproc) as pool:
                    results = pool.map(
                        partial(
                            _build_one_safe,
                            pssm=pssm,
                            ref=ref,
                            biopython=biopython,
                            graph_type=graph_type,
                        ),
                        pdbs,
                    )
            finally:
                if saved is None:
                    os.environ.pop("JAX_PLATFORMS", None)
                else:
                    os.environ["JAX_PLATFORMS"] = saved
            graphs = [g for g in results if g is not None]

        with h5py.File(outfile, "w") as f5:
            for g in graphs:
                try:
                    g.nx2h5(f5)
                except Exception as e:
                    print("Issue encountered while storing graph ", g.pdb)
                    print(e)

        self.graphs = graphs

    @staticmethod
    def _find_ref(ref_path: str, base_name: Optional[str]) -> Optional[str]:
        if base_name is None:
            return None
        cand = os.path.join(ref_path, base_name + ".pdb")
        if os.path.isfile(cand):
            return cand
        # tolerate suffixed reference files (e.g. '<name>.pdb.save')
        matches = sorted(glob.glob(os.path.join(ref_path, base_name + ".pdb*")))
        return matches[0] if matches else None

    @staticmethod
    def _get_pssm(
        pssm_path: str, mol_name: str, base_name: str
    ) -> Dict[str, str]:
        """PSSM discovery with the reference's 3 naming fallbacks
        (`GraphGenMP.py:181-205`)."""
        for fmt in (
            "{base}.{chain}.pssm",
            "{base}.{chain}.pdb.pssm",
            "{mol}.{chain}.pdb.pssm",
        ):
            pa = os.path.join(
                pssm_path, fmt.format(base=base_name, mol=mol_name, chain="A")
            )
            pb = os.path.join(
                pssm_path, fmt.format(base=base_name, mol=mol_name, chain="B")
            )
            if os.path.isfile(pa) and os.path.isfile(pb):
                return {"A": pa, "B": pb}
        raise FileNotFoundError("PSSM file for " + mol_name + " not found")
