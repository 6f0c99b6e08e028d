"""Sharded pool scoring: the 1M-patch campaign path (driver config #5).

The pool's padded volumes are replicated (they are small relative to HBM);
the *candidate index set* is sharded over the ``data`` axis.  Each shard
gathers + scores its slice of the pool in one program (fused gather ->
forward -> uncertainty), runs a local top-k, and the k*n_shards candidates
are all-gathered and reduced — the SURVEY §2.7 "pool sharding" design.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nnal_tpu.data.patches import gather_patches_normalized
from nnal_tpu.models.cnn import cast_float_params, apply_cnn
from nnal_tpu.scoring.grid_eval import extract_normalize


def make_sharded_pool_selector(spec, mesh: Mesh, patch_shape, orig_shape,
                               k: int, ntb_per_shard: int = 4096):
    """Build ``(params, padded, mu, sd, inds) -> (scores, global_positions)``
    selecting the k most-uncertain pool voxels across the mesh.

    ``inds`` is the full raveled index vector, padded by the caller to a
    multiple of ``data_parallelism``; sentinel index 0 positions are masked
    via the companion ``valid`` vector.
    """
    from jax.experimental.shard_map import shard_map

    dp = mesh.shape["data"]

    def local(params, padded, mu, sd, inds, valid):
        x = gather_patches_normalized(padded, inds, mu, sd,
                                      tuple(patch_shape),
                                      tuple(orig_shape))
        out = apply_cnn(spec, params, x)
        unc = jnp.abs(out.posteriors[:, 1] - 0.5)
        score = jnp.where(valid, -unc, -jnp.inf)   # larger = more uncertain
        vals, idx = jax.lax.top_k(score, k)
        shard = jax.lax.axis_index("data")
        gidx = idx + shard * inds.shape[0]
        all_vals = jax.lax.all_gather(vals, "data", tiled=True)
        all_idx = jax.lax.all_gather(gidx, "data", tiled=True)
        top_vals, pos = jax.lax.top_k(all_vals, k)
        return top_vals, all_idx[pos]

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("data"), P("data")),
        out_specs=(P(), P()),
        check_rep=False)

    @jax.jit
    def select(params, padded, mu, sd, inds, valid):
        return sharded(params, padded, mu, sd, inds, valid)

    def run(params, padded, mu, sd, pool_inds: np.ndarray
            ) -> Tuple[np.ndarray, np.ndarray]:
        n = len(pool_inds)
        pad = -n % dp
        inds = np.concatenate([np.asarray(pool_inds, np.int64),
                               np.zeros(pad, np.int64)])
        valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        inds_sh = jax.device_put(jnp.asarray(inds),
                                 NamedSharding(mesh, P("data")))
        valid_sh = jax.device_put(jnp.asarray(valid),
                                  NamedSharding(mesh, P("data")))
        rep = NamedSharding(mesh, P())
        vals, gpos = select(
            jax.device_put(params, rep), jax.device_put(padded, rep),
            jax.device_put(jnp.asarray(np.asarray(mu, np.float32)), rep),
            jax.device_put(jnp.asarray(np.asarray(sd, np.float32)), rep),
            inds_sh, valid_sh)
        gpos = np.asarray(gpos)
        return np.asarray(vals), gpos

    return run


def make_sharded_grid_selector(spec, mesh: Mesh, patch_shape, orig_shape,
                               grid_spacing: int, k: int,
                               z_inner: int = 2):
    """Sharded im2col grid sweep: axial slices are sharded over the ``data``
    axis; each shard extracts + scores its slice block with
    ``conv_general_dilated_patches`` (the fast path — arbitrary-index
    gathers cost ~8x more per patch on TPU), runs a local top-k over its grid
    rows, and the candidates are all-gathered and reduced.

    The shard-local sweep streams ``z_inner`` slices at a time through a
    ``lax.map`` so HBM holds one chunk of patch activations regardless of
    pool size (a 1M-patch block would otherwise materialize ~30 GB).

    Returns ``run(params, padded, mu, sd) -> (scores, grid_rows)`` where
    grid rows are z-major (z * nx + gx) * ny + gy over the full grid.
    """
    from jax.experimental.shard_map import shard_map

    d1, d2, d3 = patch_shape
    assert d3 == 1
    g = int(grid_spacing)
    s1, s2, s3 = orig_shape
    nx = len(range(0, s1, g))
    ny = len(range(0, s2, g))
    dp = mesh.shape["data"]
    z_pad = -s3 % (dp * z_inner)
    rows_per_step = z_inner * nx * ny

    def local(params, slices_block, mu, sd):
        # slices_block: (zc, D1p, D2p, m) — this shard's slice range
        zc = slices_block.shape[0]
        nsteps = zc // z_inner
        shard = jax.lax.axis_index("data")
        blocks = slices_block.reshape((nsteps, z_inner)
                                      + slices_block.shape[1:])

        def score_step(args):
            step, blk = args
            x = extract_normalize(blk, d1, d2, g, mu, sd)
            out = apply_cnn(spec, params, x)
            unc = jnp.abs(out.posteriors[:, 1] - 0.5)
            row_z = jax.lax.broadcasted_iota(
                jnp.int32, (rows_per_step, 1), 0)[:, 0] // (nx * ny)
            global_z = row_z + step * z_inner + shard * zc
            score = jnp.where(global_z < s3, -unc, -jnp.inf)
            vals, idx = jax.lax.top_k(score, k)
            return vals, idx + step * rows_per_step

        steps = jnp.arange(nsteps)
        vals, idxs = jax.lax.map(score_step, (steps, blocks))
        vals = vals.reshape(-1)
        idxs = idxs.reshape(-1)
        lvals, lpos = jax.lax.top_k(vals, k)
        lidx = idxs[lpos] + shard * (zc * nx * ny)
        all_vals = jax.lax.all_gather(lvals, "data", tiled=True)
        all_idx = jax.lax.all_gather(lidx, "data", tiled=True)
        top_vals, pos = jax.lax.top_k(all_vals, k)
        return top_vals, all_idx[pos]

    sharded = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data"), P(), P()),
        out_specs=(P(), P()),
        check_rep=False))

    def run(params, padded, mu, sd):
        slices = jnp.transpose(jnp.asarray(padded), (3, 1, 2, 0))
        if z_pad:
            slices = jnp.pad(slices, ((0, z_pad), (0, 0), (0, 0), (0, 0)))
        rep = NamedSharding(mesh, P())
        vals, rows = sharded(
            jax.device_put(params, rep),
            jax.device_put(slices, NamedSharding(mesh, P("data"))),
            jax.device_put(jnp.asarray(np.asarray(mu, np.float32)), rep),
            jax.device_put(jnp.asarray(np.asarray(sd, np.float32)), rep))
        return np.asarray(vals), np.asarray(rows)

    return run


def make_sharded_fim_grid_selector(spec, mesh: Mesh, patch_shape,
                                   orig_shape, grid_spacing: int, B: int,
                                   z_inner: int = 2, compute_dtype=None):
    """Sharded fused posterior+FIM grid sweep — the fi pipeline's device
    stage over the mesh: each shard im2col-extracts + scores its slice
    block with ``pool_score_fused(with_fim=True)`` (posterior, binary
    uncertainty AND 'sum'-shrunk per-class gradients in one program), runs
    a local top-B by uncertainty, and the candidates are all-gathered with
    their shrunk-gradient rows and reduced to the global top B.  The host
    then assembles A-matrices -> SDP -> PMF exactly as the single-device fi
    path (scoring/fisher.py) — only (B, c, L) floats cross the ICI/host
    boundary, never the pool.

    Returns ``run(params, padded, mu, sd) -> (scores, grid_rows, p1,
    shrunk)`` sorted by descending uncertainty score.
    """
    from jax.experimental.shard_map import shard_map

    from nnal_tpu.ops.scoring_fused import pool_score_fused

    d1, d2, d3 = patch_shape
    assert d3 == 1
    g = int(grid_spacing)
    s1, s2, s3 = orig_shape
    nx = len(range(0, s1, g))
    ny = len(range(0, s2, g))
    dp = mesh.shape["data"]
    z_pad = -s3 % (dp * z_inner)
    rows_per_step = z_inner * nx * ny

    def local(params, slices_block, mu, sd):
        zc = slices_block.shape[0]
        nsteps = zc // z_inner
        shard = jax.lax.axis_index("data")
        blocks = slices_block.reshape((nsteps, z_inner)
                                      + slices_block.shape[1:])

        def score_step(args):
            step, blk = args
            x = extract_normalize(blk, d1, d2, g, mu, sd)
            out = pool_score_fused(spec, params, x, True, compute_dtype)
            row_z = jax.lax.broadcasted_iota(
                jnp.int32, (rows_per_step, 1), 0)[:, 0] // (nx * ny)
            global_z = row_z + step * z_inner + shard * zc
            # larger = more uncertain; padding slices masked out
            score = jnp.where(global_z < s3, -out["uncertainty"],
                              -jnp.inf)
            vals, idx = jax.lax.top_k(score, B)
            return (vals, idx + step * rows_per_step,
                    out["p1"][idx], out["shrunk"][idx])

        steps = jnp.arange(nsteps)
        vals, idxs, p1s, shrunks = jax.lax.map(score_step, (steps, blocks))
        vals = vals.reshape(-1)
        idxs = idxs.reshape(-1)
        p1s = p1s.reshape(-1)
        shrunks = shrunks.reshape((-1,) + shrunks.shape[2:])
        lvals, lpos = jax.lax.top_k(vals, B)
        lidx = idxs[lpos] + shard * (zc * nx * ny)
        lp1 = p1s[lpos]
        lshrunk = shrunks[lpos]
        all_vals = jax.lax.all_gather(lvals, "data", tiled=True)
        all_idx = jax.lax.all_gather(lidx, "data", tiled=True)
        all_p1 = jax.lax.all_gather(lp1, "data", tiled=True)
        all_shrunk = jax.lax.all_gather(lshrunk, "data", tiled=True)
        top_vals, pos = jax.lax.top_k(all_vals, B)
        return top_vals, all_idx[pos], all_p1[pos], all_shrunk[pos]

    sharded = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data"), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_rep=False))

    def run(params, padded, mu, sd):
        slices = jnp.transpose(jnp.asarray(padded), (3, 1, 2, 0))
        if z_pad:
            slices = jnp.pad(slices, ((0, z_pad), (0, 0), (0, 0), (0, 0)))
        rep = NamedSharding(mesh, P())
        vals, rows, p1, shrunk = sharded(
            jax.device_put(params, rep),
            jax.device_put(slices, NamedSharding(mesh, P("data"))),
            jax.device_put(jnp.asarray(np.asarray(mu, np.float32)), rep),
            jax.device_put(jnp.asarray(np.asarray(sd, np.float32)), rep))
        return (np.asarray(vals), np.asarray(rows), np.asarray(p1),
                np.asarray(shrunk))

    return run


def grid_row_to_voxel(rows, orig_shape, grid_spacing: int) -> np.ndarray:
    """Map full-grid row ids (z-major) back to raveled voxel indices."""
    s1, s2, s3 = orig_shape
    g = int(grid_spacing)
    nx = len(range(0, s1, g))
    ny = len(range(0, s2, g))
    rows = np.asarray(rows, np.int64)
    gy = rows % ny
    rem = rows // ny
    gx = rem % nx
    z = rem // nx
    return (gx * g * s2 + gy * g) * s3 + z


def make_sharded_dense_segmenter(spec, mesh: Mesh, patch_shape, orig_shape,
                                 op: str = "posteriors", z_inner: int = 1,
                                 compute_dtype=None):
    """Mesh-sharded whole-volume dense segmentation (serving): axial
    slices shard over the ``data`` axis and each shard runs the stride-1
    im2col sweep over its slice block (the single-device path of
    ``evaluation.inference.full_volume_patchwise``), streaming ``z_inner``
    slices per ``lax.map`` step so HBM holds one chunk of patch
    activations per shard.  No collectives are needed — each output voxel
    belongs to exactly one shard — so throughput scales linearly with
    ``mesh.shape['data']``.

    Returns ``run(params, padded, mu, sd) -> (s1, s2, s3) ndarray`` of
    per-voxel ``op`` values ('posteriors' = P(class 1) for binary specs,
    or 'prediction').
    """
    from jax.experimental.shard_map import shard_map

    d1, d2, d3 = patch_shape
    assert d3 == 1
    s1, s2, s3 = orig_shape
    dp = mesh.shape["data"]
    z_pad = -s3 % (dp * z_inner)

    def local(params, slices_block, mu, sd):
        zc = slices_block.shape[0]
        nsteps = zc // z_inner
        blocks = slices_block.reshape((nsteps, z_inner)
                                      + slices_block.shape[1:])
        if compute_dtype is not None:
            p_c = cast_float_params(params, compute_dtype)
        else:
            p_c = params

        def seg_step(blk):
            x = extract_normalize(blk, d1, d2, 1, mu, sd)
            if compute_dtype is not None:
                x = x.astype(compute_dtype)
            out = apply_cnn(spec, p_c, x)
            if op == "prediction":
                return out.prediction
            return out.posteriors[:, 1].astype(jnp.float32) \
                if spec.nclass == 2 else out.posteriors

        vals = jax.lax.map(seg_step, blocks)
        return vals.reshape((zc * s1 * s2,) + vals.shape[2:])

    sharded = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data"), P(), P()),
        out_specs=P("data"),
        check_rep=False))

    def run(params, padded, mu, sd) -> np.ndarray:
        slices = jnp.transpose(jnp.asarray(padded), (3, 1, 2, 0))
        if z_pad:
            slices = jnp.pad(slices, ((0, z_pad), (0, 0), (0, 0), (0, 0)))
        rep = NamedSharding(mesh, P())
        out = sharded(
            jax.device_put(params, rep),
            jax.device_put(slices, NamedSharding(mesh, P("data"))),
            jax.device_put(jnp.asarray(np.asarray(mu, np.float32)), rep),
            jax.device_put(jnp.asarray(np.asarray(sd, np.float32)), rep))
        flat = np.asarray(out)[:s3 * s1 * s2]
        # shard-local layout is (z, x, y); volume convention is (x, y, z)
        return np.moveaxis(flat.reshape((s3, s1, s2) + flat.shape[1:]),
                           0, 2)

    return run
