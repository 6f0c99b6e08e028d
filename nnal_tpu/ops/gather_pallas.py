"""Pallas kernel: patch gather + normalization from an HBM-resident volume.

The pool-scoring input stage gathers (d1, d2, 1) windows around scattered
voxel indices (reference's per-patch Python loop, patch_utils.py:1148-1165;
XLA path: vmapped ``dynamic_slice`` in data.patches).  This kernel does the
same with explicit double-buffered DMA: indices arrive via scalar prefetch,
each patch window is DMA'd HBM->VMEM while the previous one is normalized
and written, so gather bandwidth overlaps the arithmetic.

Hardware constraint (real v5e Mosaic): any DMA slice's lane (last) dim must
be a multiple of the 128-lane tile — even a "full" small dim fails, because
the memref itself is lane-padded.  The volume is therefore laid out
``(m, D1p, D3p, D2pp)`` with the second spatial axis on the lane dim padded
to a 128 multiple: x/z are sliced on untiled dims, whole 128-aligned rows
are copied, and the y-window is selected in VMEM with a dynamic lane roll
(``pltpu.roll``) + static slice.  Only the patch-wise workhorse layout
``d3 == 1`` is supported; other depths fall back to the XLA gather.

Hardware status (benchmarks/KERNELS_r02.json): validated bit-exact against
the XLA gather on chips for volumes whose padded row width fits one lane
tile (D2pp == 128).  For wider volumes Mosaic switches the HBM memref to
(8, 128) tiling and then requires 8-aligned *sublane* slice shapes too,
which forbids the 1-deep z slice — those shapes raise at compile time.
Hence ``gather_patches_auto`` defaults to the XLA path; the im2col grid
sweep (scoring/grid_eval.py) is the production pool path regardless.

Kept alongside the XLA gather behind one dispatch (``gather_patches_auto``);
the benchmark decides which is the default on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nnal_tpu.data.patches import gather_patches_normalized

BLOCK = 128  # patches per grid step


def _make_gather_kernel(m: int, d1: int, d2: int, d2pp: int):
    """Kernel factory for d3 == 1 patches over a (m, D1p, D3p, D2pp)
    volume (rows on the lane dim, padded to a 128 multiple)."""

    def kernel(idx_ref, vol_ref, mu_ref, sd_ref, out_ref, scratch, sem):
        # idx_ref: prefetched (3, n) coordinates; out block:
        # (BLOCK, m, d1, d2) in VMEM; scratch: (2, m, d1, 1, d2pp)
        i = pl.program_id(0)

        def dma(slot, p):
            x = idx_ref[0, i * BLOCK + p]
            z = idx_ref[2, i * BLOCK + p]
            return pltpu.make_async_copy(
                vol_ref.at[:, pl.ds(x, d1), pl.ds(z, 1), :],
                scratch.at[slot],
                sem.at[slot],
            )

        dma(0, 0).start()

        def body(p, _):
            slot = p % 2
            nxt = (p + 1) % 2

            @pl.when(p + 1 < BLOCK)
            def _():
                dma(nxt, p + 1).start()

            dma(slot, p).wait()
            y = idx_ref[1, i * BLOCK + p]
            for j in range(m):  # static unroll over modalities
                row = scratch[slot, j, :, 0, :]          # (d1, d2pp)
                # rotate the window start to lane 0, keep the first d2
                rolled = pltpu.roll(row, d2pp - y, axis=1)
                win = rolled[:, :d2]                     # (d1, d2)
                out_ref[p, j, :, :] = (win - mu_ref[j]) / sd_ref[j]
            return 0

        jax.lax.fori_loop(0, BLOCK, body, 0)

    return kernel


@partial(jax.jit, static_argnames=("patch_shape", "orig_shape", "interpret"))
def gather_patches_pallas(padded: jnp.ndarray, inds: jnp.ndarray,
                          mu: jnp.ndarray, sd: jnp.ndarray,
                          patch_shape, orig_shape,
                          interpret: bool = False) -> jnp.ndarray:
    """Same contract as data.patches.gather_patches_normalized
    (d3 == 1 only)."""
    d1, d2, d3 = patch_shape
    assert d3 == 1, "Pallas gather supports the d3 == 1 workhorse layout"
    m = padded.shape[0]
    n = inds.shape[0]
    n_pad = -n % BLOCK
    inds_p = jnp.pad(inds, (0, n_pad))
    s1, s2, s3 = orig_shape
    z = (inds_p % s3).astype(jnp.int32)
    rem = inds_p // s3
    y = (rem % s2).astype(jnp.int32)
    x = (rem // s2).astype(jnp.int32)
    coords = jnp.stack([x, y, z])                  # (3, n_padded)

    # (m, D1p, D2p, D3p) -> (m, D1p, D3p, D2pp): y-rows ride the lane dim,
    # padded to a 128 multiple so whole-row DMA slices are tile-aligned
    vol = jnp.transpose(padded.astype(jnp.float32), (0, 1, 3, 2))
    d2p = vol.shape[-1]
    d2pp = -(-d2p // 128) * 128
    vol = jnp.pad(vol, ((0, 0), (0, 0), (0, 0), (0, d2pp - d2p)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=((n + n_pad) // BLOCK,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # volume stays in HBM
            pl.BlockSpec(memory_space=pltpu.SMEM),    # mu scalars (m,)
            pl.BlockSpec(memory_space=pltpu.SMEM),    # sd scalars (m,)
        ],
        out_specs=pl.BlockSpec((BLOCK, m, d1, d2),
                               lambda i, idx_ref: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, m, d1, 1, d2pp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _make_gather_kernel(m, d1, d2, d2pp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n + n_pad, m, d1, d2),
                                       jnp.float32),
        interpret=interpret,
    )(coords, vol,
      jnp.asarray(mu, jnp.float32), jnp.asarray(sd, jnp.float32))
    # (n, m, d1, d2) -> model layout (n, d1, d2, m) (== m*d3 with d3 == 1)
    return jnp.transpose(out[:n], (0, 2, 3, 1))


def gather_patches_auto(padded, inds, mu, sd, patch_shape, orig_shape,
                        prefer_pallas: bool | None = None):
    """Dispatch between the Pallas DMA gather and the XLA vmapped
    dynamic-slice gather."""
    if prefer_pallas is None:
        prefer_pallas = False  # default: XLA until the bench flips it
    if (prefer_pallas and patch_shape[2] == 1
            and jax.devices()[0].platform == "tpu"):
        return gather_patches_pallas(padded, jnp.asarray(inds), mu, sd,
                                     tuple(patch_shape), tuple(orig_shape))
    return gather_patches_normalized(padded, jnp.asarray(inds),
                                     jnp.asarray(mu), jnp.asarray(sd),
                                     tuple(patch_shape), tuple(orig_shape))
