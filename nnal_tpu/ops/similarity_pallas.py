"""Pallas kernel: tiled cosine-similarity max-reduction.

Core-set and rep-entropy need ``max_j sim(pool_i, ref_j)`` over huge pools
(reference tiles 5000-wide chunks on host, PW_NNAL.py:1041-1136).  The XLA
path materializes an (n, m) similarity block per tile in HBM; this kernel
keeps each (TILE_N, TILE_M) block in VMEM — one MXU matmul per tile, a
running row-max accumulator, nothing but the final (n,) vector ever leaving
VMEM for HBM.

Inputs are pre-normalized rows (cosine == dot).  Grid is (n_tiles, m_tiles);
m is the inner (fastest) axis so the accumulator tile stays resident while
reference tiles stream through.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 512
TILE_M = 512


def _tiles_for(d: int):
    """Tile sizes that fit VMEM (~16 MB/core): two (T, d) f32 operand
    tiles plus the (T, T) product must stay well under the limit.  d=128
    features run at the full 512 tile; d=4096 (the PW1 fc2 feature dim —
    a real campaign VMEM-OOMed here) floors to the 128 minimum
    (10MB / (3*4096*4B) = 213 -> rounded down to the 128 lane multiple)."""
    budget = 10 * 1024 * 1024
    t = budget // (3 * d * 4)
    t = max(128, min(512, (t // 128) * 128))
    return t, t


def _make_rowmax_kernel(m_valid: int, tile_m: int):
    """Kernel closure over the true (unpadded) reference count, so padded
    columns are masked to -inf before the row max.

    The accumulator block is ``(8, TILE_N)`` with all 8 sublanes carrying
    the same row-max vector: real v5e Mosaic requires f32 block trailing
    dims divisible by (8, 128) (a 1-D block fails layout verification, a
    (1, TILE_N) block fails the sublane rule).  The 8x redundant write is
    ~16 KB per tile — noise next to the MXU matmul; the caller keeps
    sublane 0."""

    def kernel(pool_ref, ref_ref, out_ref):
        j = pl.program_id(1)
        block = jnp.dot(pool_ref[:], ref_ref[:].T,
                        preferred_element_type=jnp.float32)
        col = j * tile_m + jax.lax.broadcasted_iota(
            jnp.int32, block.shape, dimension=1)
        block = jnp.where(col < m_valid, block, -jnp.inf)
        row_max = jnp.broadcast_to(jnp.max(block, axis=1)[None, :],
                                   out_ref.shape)

        @pl.when(j == 0)
        def _():
            out_ref[:, :] = row_max

        @pl.when(j > 0)
        def _():
            out_ref[:, :] = jnp.maximum(out_ref[:, :], row_max)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def max_similarity_pallas(pool_normed: jnp.ndarray, ref_normed: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """(n,) max dot-product of each pool row against all reference rows.

    Rows must be L2-normalized.  Shapes are padded to tile multiples; the
    reference padding rows are zero (dot = 0), which is only correct when a
    true max can exceed 0 — callers padding with zeros must mask, so padding
    reference rows are filled with -1 direction instead (dot >= -1 bounds
    cosine from below).
    """
    n, d = pool_normed.shape
    m = ref_normed.shape[0]
    tile_n, tile_m = _tiles_for(d)
    n_pad = -n % tile_n
    m_pad = -m % tile_m
    pool_p = jnp.pad(pool_normed.astype(jnp.float32), ((0, n_pad), (0, 0)))
    ref_p = jnp.pad(ref_normed.astype(jnp.float32), ((0, m_pad), (0, 0)))

    n_tiles = pool_p.shape[0] // tile_n
    grid = (n_tiles, ref_p.shape[0] // tile_m)
    out = pl.pallas_call(
        _make_rowmax_kernel(m, tile_m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile_n), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * 8, tile_n), jnp.float32),
        interpret=interpret,
    )(pool_p, ref_p)
    return out.reshape(n_tiles, 8, tile_n)[:, 0, :].reshape(-1)[:n]


def max_similarity(pool_feats, ref_feats, use_pallas: bool | None = None):
    """Normalize + max-similarity; Pallas on TPU, XLA fallback elsewhere
    (same contract as scoring.representative.cross_max_similarities)."""
    pool = jnp.asarray(pool_feats)
    ref = jnp.asarray(ref_feats)
    pool_n = pool / jnp.linalg.norm(pool, axis=1, keepdims=True)
    ref_n = ref / jnp.linalg.norm(ref, axis=1, keepdims=True)
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if use_pallas:
        return max_similarity_pallas(pool_n, ref_n)
    return jnp.max(jnp.dot(pool_n, ref_n.T,
                           preferred_element_type=jnp.float32), axis=1)
