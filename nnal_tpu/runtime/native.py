"""ctypes bindings for the native host runtime (patch_gather.cc).

The shared library is built lazily with g++ on first use and cached next to
the source; everything degrades to the NumPy path if the toolchain is
missing, so the framework never hard-depends on native code.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "patch_gather.cc")
_SO = os.path.join(_HERE, "_patch_gather.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


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
            lib.gather_patches_f32.restype = None
            lib.gather_labels_f32.restype = None
            _lib = lib
        except (OSError, subprocess.CalledProcessError):
            _build_failed = True
        return _lib


def native_available() -> bool:
    return _build() is not None


def gather_patches_native(padded_vols: List[np.ndarray], inds: np.ndarray,
                          patch_shape, orig_shape, mu, sd) -> np.ndarray:
    """Host-side equivalent of data.patches.gather_patches_normalized.

    ``padded_vols``: list of m padded float32 C-order volumes.
    """
    lib = _build()
    d1, d2, d3 = patch_shape
    m = len(padded_vols)
    vols = [np.ascontiguousarray(v, dtype=np.float32) for v in padded_vols]
    inds = np.ascontiguousarray(inds, dtype=np.int64)
    b = len(inds)
    out = np.empty((b, d1, d2, m * d3), dtype=np.float32)
    if lib is None:
        # NumPy fallback mirrors the native kernel
        s = orig_shape
        x, y, z = np.unravel_index(inds, s)
        for i in range(b):
            for j in range(m):
                w = vols[j][x[i]:x[i] + d1, y[i]:y[i] + d2,
                            z[i]:z[i] + d3]
                out[i, :, :, j * d3:(j + 1) * d3] = (w - mu[j]) / sd[j]
        return out

    ptrs = (ctypes.POINTER(ctypes.c_float) * m)(
        *[v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for v in vols])
    D1p, D2p, D3p = vols[0].shape
    s1, s2, s3 = orig_shape
    mu = np.ascontiguousarray(mu, dtype=np.float32)
    sd = np.ascontiguousarray(sd, dtype=np.float32)
    lib.gather_patches_f32(
        ptrs, ctypes.c_int64(m),
        ctypes.c_int64(D1p), ctypes.c_int64(D2p), ctypes.c_int64(D3p),
        ctypes.c_int64(s1), ctypes.c_int64(s2), ctypes.c_int64(s3),
        inds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(b),
        ctypes.c_int64(d1), ctypes.c_int64(d2), ctypes.c_int64(d3),
        mu.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sd.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def gather_labels_native(mask: np.ndarray, inds: np.ndarray) -> np.ndarray:
    lib = _build()
    mask = np.ascontiguousarray(mask, dtype=np.float32)
    inds = np.ascontiguousarray(inds, dtype=np.int64)
    out = np.empty(len(inds), dtype=np.float32)
    if lib is None:
        return mask.reshape(-1)[inds].astype(np.float32)
    lib.gather_labels_f32(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(mask.shape[1]), ctypes.c_int64(mask.shape[2]),
        inds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(inds)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
