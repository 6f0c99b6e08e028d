"""Volume IO and dataset registry.

The reference reads volumes with pynrrd/nibabel/cv2 and hard-codes cluster
paths per dataset (datasets/path_loader.py).  Here IO is an extension-keyed
reader registry — ``.npy``/``.npz`` natively, ``.nrrd``/``.nii(.gz)`` when
the optional readers are importable — plus a ``SubjectRegistry`` replacing
the per-dataset ``extract_*_data_path`` functions
(datasets/path_loader.py:5-367): a subject is ``{modality: path}`` plus a
mask path, discovered from a root directory or declared in YAML.
Synthetic-subject generation (random smooth blobs) backs tests/benchmarks.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np

_READERS: Dict[str, Callable[[str], np.ndarray]] = {}


def register_reader(ext: str, fn: Callable[[str], np.ndarray]) -> None:
    _READERS[ext] = fn


def read_volume(path: str) -> np.ndarray:
    for ext in sorted(_READERS, key=len, reverse=True):
        if path.endswith(ext):
            return _READERS[ext](path)
    raise ValueError(f"no reader registered for {path!r} "
                     f"(available: {sorted(_READERS)})")


register_reader(".npy", lambda p: np.load(p))
register_reader(".npz", lambda p: np.load(p)["vol"])

try:  # optional: pynrrd (reference's primary format, patch_utils.py:5)
    import nrrd as _nrrd

    register_reader(".nrrd", lambda p: _nrrd.read(p)[0])
except ImportError:  # self-contained fallback (data/formats.py)
    from .formats import read_nrrd as _read_nrrd

    register_reader(".nrrd", lambda p: _read_nrrd(p)[0])

try:  # optional: nibabel (reference datasets/utils.py:3)
    import nibabel as _nib

    register_reader(".nii", lambda p: np.asanyarray(_nib.load(p).dataobj))
    register_reader(".nii.gz", lambda p: np.asanyarray(_nib.load(p).dataobj))
    register_reader(".hdr", lambda p: np.asanyarray(_nib.load(p).dataobj))
except ImportError:  # self-contained fallback (data/formats.py)
    from .formats import read_nifti as _read_nifti

    register_reader(".nii", _read_nifti)
    register_reader(".nii.gz", _read_nifti)
    register_reader(".hdr", _read_nifti)  # detached .hdr/.img pair


@dataclass
class Subject:
    """One imaging subject: ordered modality paths + mask path."""

    modality_paths: List[str]
    mask_path: Optional[str] = None
    name: str = ""

    def load(self):
        vols = [read_volume(p) for p in self.modality_paths]
        mask = read_volume(self.mask_path) if self.mask_path else None
        return vols, mask


@dataclass
class SubjectRegistry:
    """Replaces the reference's seven hard-coded ``extract_*_data_path``
    extractors with one declarative registry."""

    subjects: List[Subject] = field(default_factory=list)

    @classmethod
    def from_dir(cls, root: str, modalities: List[str],
                 mask_name: str) -> "SubjectRegistry":
        """Each subdirectory of ``root`` is one subject containing files named
        by modality (reference `get_subdirs` + per-dataset conventions)."""
        subs = []
        for d in sorted(os.listdir(root)):
            sdir = os.path.join(root, d)
            if not os.path.isdir(sdir):
                continue
            mods = [os.path.join(sdir, m) for m in modalities]
            mask = os.path.join(sdir, mask_name)
            if all(os.path.exists(p) for p in mods):
                subs.append(Subject(mods, mask if os.path.exists(mask) else None, d))
        return cls(subs)

    @classmethod
    def from_lists(cls, img_paths: List[List[str]],
                   mask_paths: List[str]) -> "SubjectRegistry":
        return cls([Subject(list(m), mk, str(i))
                    for i, (m, mk) in enumerate(zip(img_paths, mask_paths))])


# --------------------------------------------------------------------------- #
# synthetic data (test/benchmark fixtures; SURVEY.md §4 item 3)
# --------------------------------------------------------------------------- #
def synthetic_subject(shape=(48, 48, 16), n_modalities: int = 2,
                      n_blobs: int = 3, seed: int = 0, nan_margin: int = 0):
    """Random smooth multi-modal volumes with blob masks.

    The mask is 1 inside a union of random ellipsoids, 0 outside, and NaN in
    an optional margin (the reference's masks carry NaN for to-be-ignored
    voxels, PW_AL.py:967-970).  Modalities are correlated noisy views whose
    intensity is elevated inside the mask, so uncertainty concentrates on
    blob boundaries — giving AL strategies real signal in tests.
    """
    rng = np.random.default_rng(seed)
    s = np.array(shape)
    zz = np.stack(np.meshgrid(*[np.arange(d) for d in shape], indexing="ij"),
                  axis=-1).astype(np.float64)
    mask = np.zeros(shape, dtype=np.float64)
    for _ in range(n_blobs):
        center = rng.uniform(0.2, 0.8, size=3) * s
        radii = rng.uniform(0.08, 0.22, size=3) * s
        dist = (((zz - center) / radii) ** 2).sum(-1)
        mask[dist < 1.0] = 1.0
    vols = []
    for m in range(n_modalities):
        base = 40.0 + 15.0 * m
        img = base + 60.0 * mask + rng.normal(0, 8.0, size=shape)
        # smooth structured background
        gx = np.sin(zz[..., 0] / (3.0 + m)) * np.cos(zz[..., 1] / (4.0 + m))
        img += 10.0 * gx
        vols.append(img)
    if nan_margin > 0:
        mask[:nan_margin] = np.nan
        mask[-nan_margin:] = np.nan
    return vols, mask


def write_synthetic_dataset(root: str, n_subjects: int = 2, **kwargs):
    """Materialize synthetic subjects as .npy files, returning a registry."""
    subs = []
    for i in range(n_subjects):
        sdir = os.path.join(root, f"sub{i}")
        os.makedirs(sdir, exist_ok=True)
        vols, mask = synthetic_subject(seed=i, **kwargs)
        mods = []
        for j, v in enumerate(vols):
            p = os.path.join(sdir, f"mod{j}.npy")
            np.save(p, v)
            mods.append(p)
        mp = os.path.join(sdir, "mask.npy")
        np.save(mp, mask)
        subs.append(Subject(mods, mp, f"sub{i}"))
    return SubjectRegistry(subs)
