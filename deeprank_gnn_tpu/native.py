"""ctypes loader for the native host-path library (native/fastpath.cpp).

Builds the shared library on first use if g++ is available; every
caller has a pure-numpy fallback, so the package works without a
toolchain (feature parity, lower featurizer throughput).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastpath.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it if needed; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.sasa_compute.restype = ctypes.c_int
        lib.sasa_compute.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
        ]
        lib.contact_pairs.restype = ctypes.c_int64
        lib.contact_pairs.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            ctypes.c_double,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
        ]
        lib.coalesce_pairs.restype = ctypes.c_int64
        lib.coalesce_pairs.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
        ]
        _lib = lib
        return _lib


def sasa_native(xyz: np.ndarray, radii: np.ndarray, n_points: int):
    """Per-atom SASA via the C++ kernel; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, dtype=np.float64)
    radii = np.ascontiguousarray(radii, dtype=np.float64)
    out = np.zeros(len(radii), dtype=np.float64)
    rc = lib.sasa_compute(len(radii), xyz, radii, n_points, out)
    return out if rc == 0 else None


def contact_pairs_native(
    xyz_a: np.ndarray,
    rid_a: np.ndarray,
    xyz_b: np.ndarray,
    rid_b: np.ndarray,
    cutoff: float,
):
    """Residue contact pairs with min distances; None if unavailable.

    Returns (res_a [m], res_b [m], dist [m]) sorted by (res_a, res_b).
    """
    lib = get_lib()
    if lib is None:
        return None
    na, nb = len(rid_a), len(rid_b)
    cap = max(1024, 64 * max(na, nb))
    res_a = np.zeros(cap, dtype=np.int64)
    res_b = np.zeros(cap, dtype=np.int64)
    dist = np.zeros(cap, dtype=np.float64)
    m = lib.contact_pairs(
        na,
        np.ascontiguousarray(xyz_a, np.float64),
        np.ascontiguousarray(rid_a, np.int64),
        nb,
        np.ascontiguousarray(xyz_b, np.float64),
        np.ascontiguousarray(rid_b, np.int64),
        float(cutoff),
        cap,
        res_a,
        res_b,
        dist,
    )
    if m < 0:
        return None
    return res_a[:m], res_b[:m], dist[:m]


def coalesce_pairs_native(src: np.ndarray, dst: np.ndarray):
    """Unique sorted (src, dst) pairs + inverse; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    e = len(src)
    usrc = np.zeros(max(e, 1), dtype=np.int32)
    udst = np.zeros(max(e, 1), dtype=np.int32)
    inverse = np.zeros(max(e, 1), dtype=np.int32)
    m = lib.coalesce_pairs(
        e,
        np.ascontiguousarray(src, np.int32),
        np.ascontiguousarray(dst, np.int32),
        usrc,
        udst,
        inverse,
    )
    return usrc[:m], udst[:m], inverse[:e]
