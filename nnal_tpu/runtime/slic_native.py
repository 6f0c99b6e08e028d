"""ctypes bindings for the native SLIC (slic.cc).

Lazy g++ build, same pattern as ``runtime.native``.  The Python wrapper
computes the grid seeds exactly as the NumPy reference implementation
(``scoring.superpixel.slic_2d``) so the two paths agree by construction on
seeding; the C++ loop mirrors the assignment/update order, so label maps
match to floating-point noise (exact on non-degenerate images).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "slic.cc")
_SO = os.path.join(_HERE, "_slic.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_f64p = ctypes.POINTER(ctypes.c_double)
_i32p = ctypes.POINTER(ctypes.c_int32)


def _build() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", _SO, _SRC],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.nnal_slic2d.restype = None
            lib.nnal_slic2d.argtypes = [
                _f64p, ctypes.c_int, ctypes.c_int, _f64p, ctypes.c_int,
                ctypes.c_int, ctypes.c_double, ctypes.c_int, _i32p]
            _lib = lib
        except (OSError, subprocess.CalledProcessError):
            _build_failed = True
        return _lib


def slic_native_available() -> bool:
    return _build() is not None


def slic_2d_native(img: np.ndarray, n_segments: int = 100,
                   compactness: float = 10.0,
                   n_iter: int = 10) -> np.ndarray:
    """Native SLIC with the NumPy path's exact seeding and semantics."""
    lib = _build()
    if lib is None:
        raise RuntimeError("native SLIC library unavailable")
    img = np.ascontiguousarray(img, dtype=np.float64)
    H, W = img.shape
    S = max(int(np.sqrt(H * W / n_segments)), 1)
    ys = np.arange(S // 2, H, S)
    xs = np.arange(S // 2, W, S)
    centers = np.array([[img[y, x], y, x] for y in ys for x in xs],
                       dtype=np.float64)
    centers = np.ascontiguousarray(centers)
    labels = np.zeros((H, W), dtype=np.int32)
    lib.nnal_slic2d(img.ctypes.data_as(_f64p), H, W,
                    centers.ctypes.data_as(_f64p), len(centers), S,
                    float(compactness), int(n_iter),
                    labels.ctypes.data_as(_i32p))
    return labels
