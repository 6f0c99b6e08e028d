"""Vectorized 3D patch extraction.

The reference's hottest host loop is ``patch_utils.get_patches`` /
``get_patches_multimg`` (patch_utils.py:1087,1175): a Python for-loop slicing
one ``(d1, d2, d3)`` window per patch per modality.  Here the whole batch is a
single jitted XLA gather: ``vmap(lax.dynamic_slice)`` over the index batch on
a stacked ``(m, D1p, D2p, D3p)`` padded volume, fused with per-modality
normalization.  Output layout matches the reference: ``(b, d1, d2, m*d3)``
with modalities concatenated along the depth axis (patch_utils.py:1147-1165).

Index semantics (identical to the reference): ``inds`` are raveled C-order
indices on the **original** (unpadded) shape; since the pad margin equals the
patch radius, the window start in the padded volume is exactly the unraveled
coordinate.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange


def patch_radii(patch_shape: Sequence[int]) -> Tuple[int, int, int]:
    return tuple(int((s - 1) // 2) for s in patch_shape)


def pad_volumes(vols, patch_shape) -> jnp.ndarray:
    """Stack per-modality volumes into ``(m, D1+2r1, D2+2r2, D3+2r3)``,
    zero-padded by the patch radii (reference pads with 'constant',
    patch_utils.py:1124-1132)."""
    r1, r2, r3 = patch_radii(patch_shape)
    vols = jnp.stack([jnp.asarray(v) for v in vols], axis=0)
    return jnp.pad(vols, ((0, 0), (r1, r1), (r2, r2), (r3, r3)))


@partial(jax.jit, static_argnames=("patch_shape", "orig_shape"))
def gather_patches(padded: jnp.ndarray, inds: jnp.ndarray,
                   patch_shape: Tuple[int, int, int],
                   orig_shape: Tuple[int, int, int]) -> jnp.ndarray:
    """Gather ``(b, d1, d2, m*d3)`` patches around raveled voxel ``inds``.

    ``padded``: ``(m, D1p, D2p, D3p)`` stacked padded modalities.
    ``inds``: ``(b,)`` raveled C-order indices on ``orig_shape``.
    """
    d1, d2, d3 = patch_shape
    m = padded.shape[0]
    x, y, z = _unravel3(inds, orig_shape)

    def one(cx, cy, cz):
        # window start in the padded volume == original coordinate
        return jax.lax.dynamic_slice(padded, (0, cx, cy, cz), (m, d1, d2, d3))

    patches = jax.vmap(one)(x, y, z)                 # (b, m, d1, d2, d3)
    return rearrange(patches, "b m a c d -> b a c (m d)")


@partial(jax.jit, static_argnames=("patch_shape", "orig_shape", "b_inner"))
def gather_patches_rowtake(padded: jnp.ndarray, inds: jnp.ndarray,
                           patch_shape: Tuple[int, int, int],
                           orig_shape: Tuple[int, int, int],
                           b_inner: int = 1024) -> jnp.ndarray:
    """``gather_patches`` rewritten for the TPU memory system: whole padded
    ROWS are gathered (one flat take of ``(D2p, m)`` slices — large,
    contiguous DMAs instead of the per-element scalar-indexed gathers a
    vmapped ``dynamic_slice`` lowers to), then each patch's ``d2`` columns
    are selected on the MXU via a per-patch one-hot matmul.  The one-hot
    contraction picks exactly one input per output (products with an exact
    1.0, additions of exact zeros) and runs at ``Precision.HIGHEST``, so
    the result is **bit-identical** to :func:`gather_patches` — asserted
    in tests and re-verified on hardware by ``benchmarks/gather_bench.py``.

    Reads ``d1*d3`` full rows (~``D2p/d2`` x the patch's bytes) per patch —
    a bandwidth trade for avoiding tiny-slice gathers.  ``b_inner`` chunks
    the batch inside ``lax.map`` to bound the row buffer.
    """
    d1, d2, d3 = patch_shape
    m, D1p, D2p, D3p = padded.shape
    b = inds.shape[0]
    if b < b_inner:   # small batches: one right-sized chunk, not 1024-pad
        b_inner = max(1, 1 << int(np.ceil(np.log2(b))))
    # (z, x) row-major flat rows: row (z', x') holds padded[:, x', :, z']
    flat = jnp.transpose(padded, (3, 1, 2, 0)).reshape(D3p * D1p, D2p, m)
    x, y, z = _unravel3(inds, orig_shape)
    # dynamic_slice clamps each start so the window stays in-bounds
    # (even patch dims shift the final start) — reproduce that exactly
    x = jnp.clip(x, 0, D1p - d1)
    y = jnp.clip(y, 0, D2p - d2)
    z = jnp.clip(z, 0, D3p - d3)

    pad_b = -b % b_inner
    if pad_b:
        x, y, z = (jnp.pad(v, (0, pad_b)) for v in (x, y, z))
    cols = jnp.arange(D2p)

    def chunk(args):
        cx, cy, cz = args
        rid = ((cz[:, None, None] + jnp.arange(d3)[None, :, None]) * D1p
               + cx[:, None, None] + jnp.arange(d1)[None, None, :])
        rows = flat[rid.reshape(-1)]        # (bi*d3*d1, D2p, m)
        rows = rows.reshape(b_inner, d3 * d1, D2p, m)
        oh = (cols[None, :, None]
              == cy[:, None, None] + jnp.arange(d2)[None, None, :]
              ).astype(rows.dtype)          # (bi, D2p, d2)
        out = jnp.einsum("brcm,bck->brkm", rows, oh,
                         precision=jax.lax.Precision.HIGHEST)
        return out.reshape(b_inner, d3, d1, d2, m)

    xb, yb, zb = (v.reshape(-1, b_inner) for v in (x, y, z))
    out = jax.lax.map(chunk, (xb, yb, zb)).reshape(-1, d3, d1, d2, m)
    if pad_b:
        out = out[:b]
    # channel layout (m-major over d3) matches gather_patches
    return rearrange(out, "b t a c m -> b a c (m t)")


@partial(jax.jit, static_argnames=("patch_shape", "orig_shape", "impl"))
def gather_patches_normalized(padded: jnp.ndarray, inds: jnp.ndarray,
                              mu: jnp.ndarray, sigma: jnp.ndarray,
                              patch_shape: Tuple[int, int, int],
                              orig_shape: Tuple[int, int, int],
                              impl: str = None) -> jnp.ndarray:
    """Patch gather fused with per-modality ``(x - mu) / sigma`` normalization
    (reference normalizes after gather, patch_utils.py:1199-1204).

    ``impl``: 'dynslice' (vmapped dynamic_slice) or 'rowtake' (row DMAs +
    one-hot MXU column select — bit-identical, faster for large scattered
    batches on TPU).  Default comes from ``NNAL_GATHER_IMPL`` (read at
    trace time; set it before the first call in a process)."""
    import os

    d3 = patch_shape[2]
    if impl is None:
        impl = os.environ.get("NNAL_GATHER_IMPL", "dynslice")
    gather = {"dynslice": gather_patches,
              "rowtake": gather_patches_rowtake}[impl]
    patches = gather(padded, inds, patch_shape, orig_shape)
    m = padded.shape[0]
    # broadcast per-modality stats over the concatenated depth axis
    mu_full = jnp.repeat(jnp.asarray(mu, patches.dtype), d3)
    sg_full = jnp.repeat(jnp.asarray(sigma, patches.dtype), d3)
    assert mu_full.shape[0] == m * d3
    return (patches - mu_full) / sg_full


def gather_labels(mask, inds, orig_shape) -> np.ndarray:
    """Labels at voxel ``inds`` from the (unpadded) mask
    (reference: ``mask[multinds]``, patch_utils.py:1171).

    Host-side on purpose: the mask lives on host, the result is tiny, and
    a device gather here recompiled once per labeled-set size — i.e. every
    AL round."""
    return np.asarray(mask).reshape(-1)[np.asarray(inds, np.int64)]


def gather_patches_multimg(all_padded, img_inds, patch_shape, stats,
                           masks=None):
    """Multi-subject gather (reference patch_utils.py:1175): for subject ``j``
    with non-empty ``img_inds[j]``, gather + normalize patches with that
    subject's per-modality ``stats[j] = [mu_0, sd_0, mu_1, sd_1, ...]``.

    Returns ``(b_patches, b_labels)`` lists indexed by subject; empty
    subjects yield empty lists, matching the reference contract.
    """
    stats = np.asarray(stats)
    b_patches = [[] for _ in img_inds]
    b_labels = [[] for _ in img_inds]
    for j, inds in enumerate(img_inds):
        inds = np.asarray(inds, dtype=np.int64)
        if inds.size == 0:
            continue
        padded = all_padded[j]
        m = padded.shape[0]
        r = patch_radii(patch_shape)
        orig_shape = tuple(int(padded.shape[1 + i] - 2 * r[i]) for i in range(3))
        mu = stats[j, 0::2][:m]
        sd = stats[j, 1::2][:m]
        b_patches[j] = gather_patches_normalized(
            padded, jnp.asarray(inds), mu, sd, tuple(patch_shape), orig_shape)
        if masks is not None:
            b_labels[j] = gather_labels(masks[j], inds, orig_shape)
    return b_patches, b_labels


def _unravel3(inds: jnp.ndarray, shape: Tuple[int, int, int]):
    s1, s2, s3 = shape
    z = inds % s3
    rem = inds // s3
    y = rem % s2
    x = rem // s2
    return x, y, z
