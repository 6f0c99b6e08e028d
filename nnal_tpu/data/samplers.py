"""Pool samplers: grid sampling, local-variance maps, balanced sampling.

Variance maps use the ``Var[x] = E[x^2] - E[x]^2`` box-filter trick the
reference computes with ``scipy.signal.convolve2d`` (patch_utils.py:794);
here it is one batched XLA depthwise convolution over all slices at once, so
whole-volume variance maps run on the MXU/VPU instead of a per-slice host
loop (reference loops slices at PW_NNAL.py:651-655).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.data.indexing import expand_raveled_inds


def generate_grid_samples(shape3d, grid_spacing: int, mask=None):
    """Raveled 3D grid indices: all voxels whose in-plane coordinates are
    multiples of ``grid_spacing``, swept over every axial slice (reference
    ``gen_multimg_inds``, PW_AL.py:921-976).

    If ``mask`` is given, voxels whose mask value is NaN are discarded and
    the corresponding labels are returned (reference drops NaN voxels).
    """
    s = tuple(shape3d)
    gx = np.arange(0, s[0], grid_spacing)
    gy = np.arange(0, s[1], grid_spacing)
    X, Y = np.meshgrid(gx, gy, indexing="ij")
    X, Y = X.ravel(), Y.ravel()
    inds = []
    labels = []
    for z in range(s[2]):
        Z = np.full_like(X, z)
        inds.append(np.ravel_multi_index((X, Y, Z), s))
        if mask is not None:
            labels.append(np.asarray(mask)[X, Y, Z])
    inds = np.concatenate(inds)
    if mask is None:
        return inds
    labels = np.concatenate(labels)
    keep = ~np.isnan(labels)
    return inds[keep], labels[keep].astype(np.int64)


@partial(jax.jit, static_argnames=("d",))
def local_variance_map(vol: jnp.ndarray, d: int) -> jnp.ndarray:
    """Per-voxel variance of the dxd in-plane patch around each voxel, for
    every axial slice of ``vol`` (shape ``(D1, D2, D3)``), via two box-filter
    convolutions (reference ``get_vars_2d``, patch_utils.py:794).

    Matches the reference's 'same' zero-padded box filter in the interior,
    including its uint-truncation of intensities (the reference casts to
    uint64; we floor to emulate that on float inputs).  Values are
    mean-centered per slice before filtering for f32 stability, which changes
    the zero-padded border ring relative to the reference (an artifact of its
    padding that is not preserved).
    """
    x = jnp.floor(jnp.asarray(vol, jnp.float32))
    # per-slice mean-centering: variance is shift-invariant, and centered
    # values avoid f32 cancellation in E[x^2] - E[x]^2
    x = x - jnp.mean(x, axis=(0, 1), keepdims=True)
    # slices become the batch axis: (D3, D1, D2, 1)
    imgs = jnp.transpose(x, (2, 0, 1))[..., None]
    kernel = jnp.ones((d, d, 1, 1), jnp.float32)
    dn = jax.lax.conv_dimension_numbers(imgs.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    def box(v):
        return jax.lax.conv_general_dilated(
            v, kernel, (1, 1), "SAME", dimension_numbers=dn) / float(d * d)
    ex = box(imgs)
    ex2 = box(imgs ** 2)
    var = ex2 - ex ** 2
    return jnp.transpose(var[..., 0], (1, 2, 0))


def high_variance_filter(vol, patch_shape, thr: float, pool_inds) -> np.ndarray:
    """Positions (into ``pool_inds``) whose local variance exceeds ``thr``
    (reference ``get_HV_inds``, PW_NNAL.py:630-666; used by 'ps-random').

    ``vol`` is the **unpadded** first-modality volume; the variance radius is
    the first patch radius, matching the reference.
    """
    d = int((patch_shape[0] - 1) // 2)
    var_map = np.asarray(local_variance_map(jnp.asarray(vol), d))
    scores = var_map.reshape(-1)[np.asarray(pool_inds, dtype=np.int64)]
    return np.flatnonzero(scores > thr)


def sample_masked_volume(img, mask, slices, N: Sequence[int], rng,
                         var_kernel: int = 5, var_thr: float = 2.0):
    """Balanced 3-way sampling per axial slice (reference
    ``sample_masked_volume`` + ``partition_2d_indices``,
    patch_utils.py:628-792): masked voxels / high-variance background /
    low-variance background, with per-slice caps ``N = (n0, n1, n2)``.

    Returns (raveled 3D indices, labels, partition types).
    """
    img = np.asarray(img)
    mask = np.asarray(mask)
    log_var = np.array(local_variance_map(jnp.asarray(img), var_kernel))
    log_var[log_var == 0] += 1e-1
    log_var = np.log(log_var)

    sel_inds, sel_labels, sel_types = [], [], []
    for s in slices:
        m2 = mask[:, :, s]
        v2 = log_var[:, :, s]
        masked = np.flatnonzero(m2.ravel() > 0)
        hvar = np.setdiff1d(np.flatnonzero(v2.ravel() > var_thr), masked)
        lvar = np.setdiff1d(np.flatnonzero(v2.ravel() < var_thr), masked)
        for t, (group, label) in enumerate(
                [(masked, 1), (hvar, 0), (lvar, 0)]):
            take = group if N[t] >= len(group) else \
                group[rng.permutation(len(group))[:N[t]]]
            g3d = expand_raveled_inds(take, s, 2, img.shape)
            sel_inds += list(g3d)
            sel_labels += [label] * len(take)
            sel_types += [t] * len(take)
    return (np.array(sel_inds, dtype=np.int64),
            np.array(sel_labels, dtype=np.int64),
            np.array(sel_types, dtype=np.int64))


def sample_types_of(img, mask, inds, var_kernel: int = 5,
                    var_thr: float = 2.0) -> np.ndarray:
    """Partition type of arbitrary voxels under the balanced-sampling rule
    (reference ``get_sample_type``, PW_analyze_results.py:69-85 — there the
    types were read back from a journaled ``inds.txt`` type column whose
    writer is absent, SURVEY.md §2.9; here they are recomputed from the
    same rule as :func:`sample_masked_volume`): 0 = masked, 1 =
    high-variance background, 2 = low-variance background (voxels exactly
    at ``var_thr`` — excluded from both groups by the sampler — classify
    as 2)."""
    img = np.asarray(img)
    mask = np.asarray(mask)
    log_var = np.array(local_variance_map(jnp.asarray(img), var_kernel))
    log_var[log_var == 0] += 1e-1
    log_var = np.log(log_var)
    pos = np.unravel_index(np.asarray(inds, np.int64), img.shape)
    return np.where(mask[pos] > 0, 0,
                    np.where(log_var[pos] > var_thr, 1, 2)).astype(np.int64)


def even_odd_slice_split(inds, shape3d) -> Tuple[np.ndarray, np.ndarray]:
    """Pool/test split by axial-slice parity: even slices -> pool, full grid
    -> test (reference ``prep_AL_data``, PW_AL.py:1004-1013, which keeps the
    whole grid as the test set)."""
    inds = np.asarray(inds, dtype=np.int64)
    z = np.unravel_index(inds, tuple(shape3d))[2]
    return inds[z % 2 == 0], inds


def filter_by_parcellation(inds, labels, parc) -> Tuple[np.ndarray,
                                                        np.ndarray]:
    """Drop samples whose voxel lies outside a parcellation map (reference
    ``preprop_NVM_data``, patch_utils.py:600-616, which read the map with
    nrrd): ``parc`` is a labeled volume or a path readable by
    ``data.io.read_volume``; samples with parcellation label 0 are
    removed.  Returns the filtered ``(inds, labels)``."""
    if isinstance(parc, str):
        from nnal_tpu.data.io import read_volume

        parc = read_volume(parc)
    parc = np.asarray(parc)
    inds = np.asarray(inds, dtype=np.int64)
    labels = np.asarray(labels)
    keep = parc[np.unravel_index(inds, parc.shape)] > 0
    return inds[keep], labels[keep]
