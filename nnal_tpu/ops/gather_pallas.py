"""Pallas kernel: patch gather + normalization from an HBM-resident volume.

The pool-scoring input stage gathers (d1, d2, d3) windows around scattered
voxel indices (reference's per-patch Python loop, patch_utils.py:1148-1165;
XLA path: vmapped ``dynamic_slice`` in data.patches).  This kernel does the
same with explicit double-buffered DMA: indices arrive via scalar prefetch,
each patch window is DMA'd HBM->VMEM while the previous one is normalized
and written, so gather bandwidth overlaps the arithmetic.

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


def _make_gather_kernel(m: int, d1: int, d2: int, d3: int):
    """Kernel factory (static dims closed over — Mosaic dislikes high-rank
    reshapes, so normalization/writes run per modality on 3D slices with
    SMEM scalar stats)."""

    def kernel(idx_ref, vol_ref, mu_ref, sd_ref, out_ref, scratch, sem):
        # idx_ref: prefetched (3, n) coordinates; vol_ref: (m, D1p, D2p,
        # D3p) in HBM; out block: (BLOCK, d1, d2, m*d3) in VMEM;
        # scratch: (2, m, d1, d2, d3) double buffer
        i = pl.program_id(0)

        def dma(slot, p):
            x = idx_ref[0, i * BLOCK + p]
            y = idx_ref[1, i * BLOCK + p]
            z = idx_ref[2, i * BLOCK + p]
            return pltpu.make_async_copy(
                vol_ref.at[:, pl.ds(x, d1), pl.ds(y, d2), pl.ds(z, d3)],
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
            for j in range(m):  # static unroll over modalities
                pj = (scratch[slot, j] - mu_ref[j]) / sd_ref[j]
                out_ref[p, :, :, j * d3:(j + 1) * d3] = pj
            return 0

        jax.lax.fori_loop(0, BLOCK, body, 0)

    return kernel


@partial(jax.jit, static_argnames=("patch_shape", "orig_shape", "interpret"))
def gather_patches_pallas(padded: jnp.ndarray, inds: jnp.ndarray,
                          mu: jnp.ndarray, sd: jnp.ndarray,
                          patch_shape, orig_shape,
                          interpret: bool = False) -> jnp.ndarray:
    """Same contract as data.patches.gather_patches_normalized."""
    d1, d2, d3 = patch_shape
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=((n + n_pad) // BLOCK,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # volume stays in HBM
            pl.BlockSpec(memory_space=pltpu.SMEM),    # mu scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),    # sd scalars
        ],
        out_specs=pl.BlockSpec((BLOCK, d1, d2, m * d3),
                               lambda i, idx_ref: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, m, d1, d2, d3), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _make_gather_kernel(m, d1, d2, d3),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n + n_pad, d1, d2, m * d3),
                                       jnp.float32),
        interpret=interpret,
    )(coords, padded.astype(jnp.float32),
      jnp.asarray(mu, jnp.float32), jnp.asarray(sd, jnp.float32))
    return out[:n]


def gather_patches_auto(padded, inds, mu, sd, patch_shape, orig_shape,
                        prefer_pallas: bool | None = None):
    """Dispatch between the Pallas DMA gather and the XLA vmapped
    dynamic-slice gather."""
    if prefer_pallas is None:
        prefer_pallas = False  # default: XLA until the bench flips it
    if prefer_pallas and jax.devices()[0].platform == "tpu":
        return gather_patches_pallas(padded, jnp.asarray(inds), mu, sd,
                                     tuple(patch_shape), tuple(orig_shape))
    return gather_patches_normalized(padded, jnp.asarray(inds),
                                     jnp.asarray(mu), jnp.asarray(sd),
                                     tuple(patch_shape), tuple(orig_shape))
