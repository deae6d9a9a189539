"""Native (C++) components, built on demand with g++ and loaded via ctypes.

Currently: exact squared Euclidean distance transform (edt.cpp) used by SDF
construction. Falls back to scipy.ndimage when the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "edt.cpp")
_SO = os.path.join(os.path.dirname(__file__), "libgpmp2_edt.so")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            if (not os.path.exists(_SO)) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     _SRC, "-o", _SO],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.edt_sq.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.edt_sq.restype = None
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def edt_available() -> bool:
    return _load() is not None


def edt(occupied: np.ndarray) -> np.ndarray:
    """Exact Euclidean distance (in cells) to the nearest True voxel.

    Matches scipy.ndimage.distance_transform_edt(~occupied) semantics:
    distance 0 at occupied voxels. Raises RuntimeError if the native
    library is unavailable (callers fall back to scipy).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native EDT unavailable")
    occupied = np.ascontiguousarray(occupied, dtype=bool)
    f = np.where(occupied, 0.0, np.inf).astype(np.float64)
    dims = np.asarray(f.shape, dtype=np.int64)
    lib.edt_sq(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(f.ndim),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return np.sqrt(f)
