"""ctypes bindings for the native DenseCRF (dense_crf.cc).

Same lazy-build pattern as ``runtime.native``: the shared library is
compiled with g++ on first use and cached next to the source; callers must
check :func:`crf_native_available` (there is no silent fallback here — the
fallback policy lives in ``evaluation.crf.dcrf_postprocess_2d``, which
degrades to the JAX mean-field CRF).

Replaces the reference's external pydensecrf C++ dependency
(/root/reference/PW_analyze_results.py:4-6,539-592) with an in-repo native
permutohedral-lattice solver computing the full dense pairwise model.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dense_crf.cc")
_SO = os.path.join(_HERE, "_dense_crf.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_f32p = ctypes.POINTER(ctypes.c_float)


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
            lib.nnal_permutohedral_filter.restype = None
            lib.nnal_permutohedral_filter.argtypes = [
                _f32p, _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                _f32p]
            lib.nnal_dcrf2d_meanfield.restype = None
            lib.nnal_dcrf2d_meanfield.argtypes = [
                _f32p, _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_float, ctypes.c_float,
                ctypes.c_float, ctypes.c_float, ctypes.c_float,
                ctypes.c_int, _f32p]
            lib.nnal_dcrf_meanfield_feats.restype = None
            lib.nnal_dcrf_meanfield_feats.argtypes = [
                _f32p, _f32p, ctypes.c_int, ctypes.c_float, _f32p,
                ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, _f32p]
            _lib = lib
        except (OSError, subprocess.CalledProcessError):
            _build_failed = True
        return _lib


def crf_native_available() -> bool:
    return _build() is not None


def permutohedral_filter(feat: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Approximate Gaussian filter ``out_i = sum_j exp(-|f_i-f_j|^2/2) v_j``
    (up to the lattice's constant gain) via the permutohedral lattice.

    ``feat``: (N, d) pre-scaled features; ``values``: (N, vd).
    """
    lib = _build()
    if lib is None:
        raise RuntimeError("native DenseCRF library unavailable")
    feat = np.ascontiguousarray(feat, dtype=np.float32)
    values = np.ascontiguousarray(values, dtype=np.float32)
    n, d = feat.shape
    vd = values.shape[1]
    assert values.shape[0] == n
    out = np.empty((n, vd), dtype=np.float32)
    lib.nnal_permutohedral_filter(
        feat.ctypes.data_as(_f32p), values.ctypes.data_as(_f32p),
        n, d, vd, out.ctypes.data_as(_f32p))
    return out


def dcrf2d_meanfield(posteriors: np.ndarray, image: Optional[np.ndarray],
                     iters: int = 5, sxy_gauss: float = 3.0,
                     w_gauss: float = 3.0, sxy_bilat: float = 50.0,
                     srgb: float = 4.0, w_bilat: float = 10.0) -> np.ndarray:
    """Full dense-CRF mean field on a (H, W, C) posterior map.

    ``image``: (H, W) or (H, W, ch) guide (any intensity scale — ``srgb``
    is in the same units), or None to drop the bilateral term.  Returns the
    refined (H, W, C) marginals.  Pairwise model matches the reference's
    pydensecrf call (PW_analyze_results.py:539-592): Gaussian smoothness +
    bilateral appearance with Potts compatibility, symmetric normalization.
    """
    lib = _build()
    if lib is None:
        raise RuntimeError("native DenseCRF library unavailable")
    posteriors = np.asarray(posteriors, dtype=np.float32)
    H, W, C = posteriors.shape
    unary = -np.log(np.clip(posteriors, 1e-8, None))
    unary = np.ascontiguousarray(unary.reshape(H * W, C))
    if image is None:
        img_ptr, ch = None, 0
        w_bilat = 0.0
    else:
        img = np.asarray(image, dtype=np.float32)
        if img.ndim == 2:
            img = img[..., None]
        ch = img.shape[-1]
        img = np.ascontiguousarray(img.reshape(H * W, ch))
        img_ptr = img.ctypes.data_as(_f32p)
    q = np.empty((H * W, C), dtype=np.float32)
    lib.nnal_dcrf2d_meanfield(
        unary.ctypes.data_as(_f32p), img_ptr, H, W, C, ch,
        sxy_gauss, w_gauss, sxy_bilat, srgb, w_bilat, int(iters),
        q.ctypes.data_as(_f32p))
    return q.reshape(H, W, C)


def dcrf_meanfield_feats(posteriors: np.ndarray, feat_g: np.ndarray,
                         w_gauss: float,
                         feat_b: Optional[np.ndarray] = None,
                         w_bilat: float = 0.0,
                         iters: int = 5) -> np.ndarray:
    """Grid-agnostic dense-CRF mean field over pre-scaled feature spaces.

    ``posteriors``: (N, C); ``feat_g``/``feat_b``: (N, d) features already
    divided by their sigmas (the kernel is ``exp(-|f_i-f_j|^2/2)``).
    Returns the refined (N, C) marginals.
    """
    lib = _build()
    if lib is None:
        raise RuntimeError("native DenseCRF library unavailable")
    posteriors = np.asarray(posteriors, dtype=np.float32)
    n, c = posteriors.shape
    unary = np.ascontiguousarray(-np.log(np.clip(posteriors, 1e-8, None)))
    feat_g = np.ascontiguousarray(feat_g, dtype=np.float32)
    assert feat_g.shape[0] == n
    if feat_b is None:
        fb_ptr, db, w_bilat = None, 0, 0.0
    else:
        feat_b = np.ascontiguousarray(feat_b, dtype=np.float32)
        assert feat_b.shape[0] == n
        fb_ptr, db = feat_b.ctypes.data_as(_f32p), feat_b.shape[1]
    q = np.empty((n, c), dtype=np.float32)
    lib.nnal_dcrf_meanfield_feats(
        unary.ctypes.data_as(_f32p), feat_g.ctypes.data_as(_f32p),
        feat_g.shape[1], w_gauss, fb_ptr, db, w_bilat, n, c, int(iters),
        q.ctypes.data_as(_f32p))
    return q


def dcrf3d_meanfield(posteriors: np.ndarray, volume: Optional[np.ndarray],
                     iters: int = 5, sxyz_gauss: float = 3.0,
                     w_gauss: float = 3.0, sxyz_bilat: float = 50.0,
                     srgb: float = 4.0, w_bilat: float = 10.0) -> np.ndarray:
    """Volumetric dense-CRF mean field (beyond the reference, which only
    refines 2D slices independently): full 3D Gaussian smoothness +
    bilateral appearance over a (H, W, D, C) posterior volume.

    ``volume``: (H, W, D) or (H, W, D, ch) guide intensities, or None to
    drop the bilateral term.  Returns refined (H, W, D, C) marginals.
    """
    posteriors = np.asarray(posteriors, dtype=np.float32)
    H, W, D, C = posteriors.shape
    n = H * W * D
    yy, xx, zz = np.meshgrid(np.arange(H, dtype=np.float32),
                             np.arange(W, dtype=np.float32),
                             np.arange(D, dtype=np.float32), indexing="ij")
    pos = np.stack([yy.ravel(), xx.ravel(), zz.ravel()], axis=-1)
    feat_g = pos / sxyz_gauss
    feat_b = None
    if volume is not None and w_bilat != 0.0:
        vol = np.asarray(volume, dtype=np.float32)
        if vol.ndim == 3:
            vol = vol[..., None]
        feat_b = np.concatenate(
            [pos / sxyz_bilat, vol.reshape(n, -1) / srgb], axis=-1)
    q = dcrf_meanfield_feats(posteriors.reshape(n, C), feat_g, w_gauss,
                             feat_b, w_bilat, iters)
    return q.reshape(H, W, D, C)
