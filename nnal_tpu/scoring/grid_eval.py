"""Grid-pool evaluation via im2col — the fast sweep path on TPU.

Measured on a real v5e chip, arbitrary-index window gathers (XLA gather /
vmapped dynamic_slice, and equivalents) cost ~8x more per patch than
strided extraction (~88K patches/s warm at bf16 25x25x2, ntb=4096) — they
lower to scalar-indexed DMAs.  But AL pools here are *regular grids* over
axial slices (reference ``prep_AL_data``/``gen_multimg_inds``,
PW_AL.py:921-1027), and extracting every grid window of a slice is exactly
``lax.conv_general_dilated_patches`` (im2col): vectorized strided copies,
orders of magnitude faster.

:class:`GridPoolEvaluator` scores the *whole grid* slice-by-slice in one
jitted program (extract -> normalize -> forward), then selects the rows the
caller asked for.  Indices that are not grid-aligned fall back to the
dynamic-slice path transparently (or, when big and clustered, to a
stride-1 slab sweep).  Multi-slice patches (``d3 > 1``) ride the same 2D
im2col by stacking each voxel's z-neighbors as channels (see
:class:`GridPoolEvaluator`).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.models.cnn import apply_cnn, cast_float_params
from nnal_tpu.scoring.pool_eval import PoolEvaluator


def extract_normalize(blk, d1, d2, g, mu, sd):
    """im2col window extraction + per-channel normalization — THE shared
    front end of every sweep here and in ``parallel/pool_sharded`` (keep
    them in lockstep; channels may be ``m*d3`` z-neighbor stacks, in
    which case ``mu``/``sd`` must already be depth-repeated).  Returns
    ``(zc*nx*ny, d1, d2, C)`` rows in z-major grid order."""
    patches = jax.lax.conv_general_dilated_patches(
        blk, filter_shape=(d1, d2), window_strides=(g, g),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    zc, nx, ny, _ = patches.shape
    c = blk.shape[-1]
    x = patches.reshape(zc * nx * ny, c, d1, d2).transpose(0, 2, 3, 1)
    return (x - mu) / sd


@partial(jax.jit, static_argnames=("spec", "patch_shape", "grid_spacing",
                                   "z_inner", "ops", "mc", "cd"))
def _grid_sweep_scan(spec, params, slices_padded, mu, sd, patch_shape,
                     grid_spacing, z_inner, ops, mc, rng, cd=None,
                     step_base=0):
    """Whole-volume grid sweep in ONE program: ``lax.map`` over z-chunks of
    ``z_inner`` slices — a single device dispatch per sweep instead of one
    per chunk (per-dispatch latency dominates on tunneled TPUs).  Large
    per-patch outputs (``feature_layer``: the whole-grid (n, 4096) tensor)
    land in the map's preallocated HBM output buffer — fine when the
    caller keeps them on device (core-set/rep-entropy), so the host path
    slab-loops instead (see ``evaluate``).  ``step_base`` offsets the MC
    dropout-key fold so a slab starting at chunk c reproduces the full
    sweep's keys bitwise."""
    d1, d2, _ = patch_shape
    g = grid_spacing
    nz_p = slices_padded.shape[0]
    nsteps = nz_p // z_inner
    blocks = slices_padded.reshape((nsteps, z_inner)
                                   + slices_padded.shape[1:])

    def one(args):
        step, blk = args
        x = extract_normalize(blk, d1, d2, g, mu, sd)
        if cd is not None:
            x = x.astype(cd)
            p_c = cast_float_params(params, cd)
        else:
            p_c = params
        key = jax.random.fold_in(rng, step_base + step) if mc else rng
        out = apply_cnn(spec, p_c, x, mc_dropout=mc, dropout_rng=key)
        res = []
        for op in ops:
            if op == "posteriors":
                res.append(out.posteriors[:, 1] if spec.nclass == 2
                           else out.posteriors)
            elif op == "posteriors_full":
                res.append(out.posteriors)
            elif op == "prediction":
                res.append(out.prediction)
            elif op == "feature_layer":
                res.append(out.feature)
            elif op == "logits":
                res.append(out.logits)
            else:
                raise ValueError(op)
        return tuple(res)

    outs = jax.lax.map(one, (jnp.arange(nsteps), blocks))
    return tuple(o.reshape((-1,) + o.shape[2:]) for o in outs)


@partial(jax.jit, static_argnames=("spec", "patch_shape", "grid_spacing",
                                   "z_inner", "cd"))
def _grid_fim_sweep(spec, params, slices_padded, mu, sd, patch_shape,
                    grid_spacing, z_inner, cd):
    """Whole-volume posterior + diag-FIM scoring in ONE program (a
    ``lax.map`` over z-chunks) returning per-patch scores for the full
    grid.  Note: when only *reductions* of the scores are needed, the
    per-chunk Python loop with on-device reduction (bench.py) measures
    ~10% faster on the tunneled chip — async dispatch pipelines chunk
    programs back-to-back while this map materializes the per-patch
    outputs in HBM.  Use this when the caller actually wants the scores
    (e.g. whole-pool diag-FIM selection)."""
    from nnal_tpu.ops.scoring_fused import pool_score_fused

    d1, d2, _ = patch_shape
    g = grid_spacing
    nsteps = slices_padded.shape[0] // z_inner
    blocks = slices_padded.reshape((nsteps, z_inner)
                                   + slices_padded.shape[1:])

    def one(blk):
        x = extract_normalize(blk, d1, d2, g, mu, sd)
        out = pool_score_fused(spec, params, x, True, cd)
        return out["p1"], out["uncertainty"], out["shrunk"]

    p1, unc, shrunk = jax.lax.map(one, blocks)
    return (p1.reshape(-1), unc.reshape(-1),
            shrunk.reshape((-1,) + shrunk.shape[2:]))


@partial(jax.jit, static_argnames=("spec", "patch_shape", "grid_spacing",
                                   "z_inner", "measure", "gaussian_std",
                                   "rotation_angle", "cd"))
def _grid_perturb_sweep(spec, params, teacher_params, slices_padded, mu, sd,
                        patch_shape, grid_spacing, z_inner, rng, measure,
                        gaussian_std, rotation_angle, cd=None, step_base=0):
    """AU_4U output-perturbation divergence for the WHOLE grid in one
    program (``lax.map`` over z-chunks) — replaces the per-chunk Python
    dispatch loop over arbitrary-index gathers (round-2: AU_4U 178.6 s vs
    BALD 132.9 s at the same budget on the tunneled chip)."""
    from nnal_tpu.models.perturb import measure_output_perturbation

    d1, d2, _ = patch_shape
    g = grid_spacing
    nsteps = slices_padded.shape[0] // z_inner
    blocks = slices_padded.reshape((nsteps, z_inner)
                                   + slices_padded.shape[1:])
    if cd is not None:
        params = cast_float_params(params, cd)
        if teacher_params is not None:
            teacher_params = jax.tree_util.tree_map(
                lambda v: v.astype(cd), teacher_params)

    def one(args):
        step, blk = args
        x = extract_normalize(blk, d1, d2, g, mu, sd)
        if cd is not None:
            x = x.astype(cd)
        key = jax.random.fold_in(rng, step_base + step)
        return measure_output_perturbation(
            spec, params, x, key, teacher_params=teacher_params,
            measure=measure, gaussian_std=gaussian_std,
            rotation_angle=rotation_angle)

    divs = jax.lax.map(one, (jnp.arange(nsteps), blocks))
    return divs.reshape(-1)


# ops whose per-patch output is wide (d_feature / nclass columns): the
# host path pulls these slab-by-slab so only one z-chunk of the wide
# tensor is ever resident in HBM (a stride-1 feature sweep is tens of GB)
_WIDE_OPS = {"posteriors_full", "feature_layer", "logits"}

# off-grid index sets route through a stride-1 slab sweep when the sweep
# is cheaper than per-patch dynamic-slice gathers.  Measured on chip
# (benchmarks/INFERENCE_r03.json, 25x25x2 bf16): sweep ~680K patches/s vs
# gather ~88K/s — a ~7.7x per-patch gap, so 6 is a conservative routing
# margin (borderline sets stay on the exact-cost gather path)
_DENSE_OFFGRID_RATIO = 6


@jax.jit
def _gather_rows(outs, idx):
    """Row-gather each sweep output on device so only the selected rows'
    bytes cross the host link (callers bucket-pad ``idx`` to keep this
    program's shape set small)."""
    return tuple(o[idx] for o in outs)


class GridPoolEvaluator(PoolEvaluator):
    """Pool evaluator specialized for grid-sampled pools.

    Multi-slice patches (``d3 > 1``) ride the same 2D im2col sweep: the
    slice stack holds each voxel's ``d3`` z-neighbors as extra channels
    (modality-major, matching the gather's ``(b, d1, d2, m*d3)`` layout,
    data/patches.py:59), so ``conv_general_dilated_patches`` over
    ``(d1, d2)`` windows reproduces the 3D gather exactly — at the
    strided-copy rate instead of per-patch dynamic slices.  Costs
    ``d3``x the slice-stack bytes and per-dispatch activation HBM.
    """

    def __init__(self, spec, padded, mu, sd, patch_shape, orig_shape,
                 grid_spacing: int, ntb: int = 4096, z_chunk: int = 4,
                 compute_dtype=None):
        super().__init__(spec, padded, mu, sd, patch_shape, orig_shape,
                         ntb=ntb, compute_dtype=compute_dtype)
        self.grid_spacing = int(grid_spacing)
        self.z_chunk = int(z_chunk)
        s1, s2, s3 = orig_shape
        self.nx = len(range(0, s1, self.grid_spacing))
        self.ny = len(range(0, s2, self.grid_spacing))
        self.nz = s3
        d3 = self.patch_shape[2]
        # even depths can't sweep: the pad margin is (d3-1)//2 per side,
        # so the last z's window runs past the padded volume and the
        # gather's dynamic_slice CLAMPS it (reference semantics) — the
        # channel stack can't reproduce that shift, so even d3 delegates
        # every evaluate to the exact dynamic-slice path
        self._sweep_ok = d3 % 2 == 1
        self._slices = None              # set below iff sweeping is legal
        if d3 == 1:
            # (D3, D1p, D2p, m) slice stack, device-resident
            self._slices = jnp.transpose(self.padded, (3, 1, 2, 0))
        elif self._sweep_ok:
            # stack z-shifted views as channels: slice z's channel
            # j*d3 + t is padded modality j at depth z + t (the window
            # start in the padded volume IS the original z coordinate)
            p = self.padded                      # (m, D1p, D2p, D3p)
            views = jnp.stack([p[..., t:t + s3] for t in range(d3)],
                              axis=1)            # (m, d3, D1p, D2p, s3)
            self._slices = jnp.transpose(views, (4, 2, 3, 0, 1)).reshape(
                (s3,) + p.shape[1:3] + (p.shape[0] * d3,))
        # sweep-side normalization constants span the concatenated depth
        # axis (the gather repeats per-modality stats the same way)
        self._mu_c = jnp.repeat(self.mu, d3)
        self._sd_c = jnp.repeat(self.sd, d3)

    # -------------------------------------------------- sweep dispatch seams
    # The mesh-sharded subclass (parallel.grid_sharded) overrides only
    # _pad_mult (z padded to a dp-multiple of chunks), _sweep_slices (the
    # cached shard-split stack) and the _dispatch_* hooks; all pad/trim/
    # cd-default bookkeeping stays here, in one home.

    def _pad_mult(self) -> int:
        return self.z_chunk

    def _sweep_slices(self):
        if not self._sweep_ok:
            # even d3 never builds a slice stack (__init__ docstring);
            # evaluate() guards on _sweep_ok but the public sweep entry
            # points land here — fail with the reason, not AttributeError
            raise ValueError(
                f"d3={self.patch_shape[2]} is even: the channel-stacked "
                "sweep cannot reproduce the clamped gather at the volume "
                "border — use evaluate() (it delegates to the exact "
                "dynamic-slice path)")
        z_pad = -self.nz % self._pad_mult()
        slices = self._slices
        if z_pad:
            slices = jnp.pad(slices, ((0, z_pad), (0, 0), (0, 0), (0, 0)))
        return slices

    def _dispatch_sweep(self, params, slices, ops, mc, rng):
        return _grid_sweep_scan(self.spec, params, slices, self._mu_c,
                                self._sd_c, self.patch_shape,
                                self.grid_spacing, self.z_chunk, ops,
                                mc, rng, self.compute_dtype)

    def _dispatch_fim(self, params, slices, cd):
        return _grid_fim_sweep(self.spec, params, slices, self._mu_c,
                               self._sd_c, self.patch_shape,
                               self.grid_spacing, self.z_chunk, cd)

    def _dispatch_perturb(self, params, teacher_params, slices, rng,
                          measure, gaussian_std, rotation_angle):
        return _grid_perturb_sweep(
            self.spec, params, teacher_params, slices, self._mu_c,
            self._sd_c, self.patch_shape, self.grid_spacing, self.z_chunk,
            rng, measure, gaussian_std, rotation_angle, self.compute_dtype)

    def fim_sweep(self, params, compute_dtype=None):
        """Posterior + diag-FIM ingredients for the WHOLE grid in one
        dispatch (see ``_grid_fim_sweep``).  Returns host arrays
        ``{"p1", "uncertainty", "shrunk"}`` of length nz*nx*ny in grid
        order (z-major)."""
        cd = compute_dtype if compute_dtype is not None \
            else self.compute_dtype
        p1, unc, shrunk = self._dispatch_fim(params, self._sweep_slices(),
                                             cd)
        n_valid = self.nz * self.nx * self.ny
        return {"p1": np.asarray(p1)[:n_valid],
                "uncertainty": np.asarray(unc)[:n_valid],
                "shrunk": np.asarray(shrunk)[:n_valid]}

    def perturb_sweep(self, params, rng, teacher_params=None,
                      measure: str = "CE", gaussian_std=0.05,
                      rotation_angle=None) -> np.ndarray:
        """AU_4U divergence scores for the whole grid in one dispatch
        (see ``_grid_perturb_sweep``); length nz*nx*ny, grid order."""
        divs = self._dispatch_perturb(params, teacher_params,
                                      self._sweep_slices(), rng, measure,
                                      gaussian_std, rotation_angle)
        return np.asarray(divs)[:self.nz * self.nx * self.ny]

    def _grid_rows(self, inds: np.ndarray):
        """Map raveled voxel indices -> full-grid row ids, or None if any
        index is off-grid."""
        s1, s2, s3 = self.orig_shape
        g = self.grid_spacing
        inds = np.asarray(inds, np.int64)
        z = inds % s3
        rem = inds // s3
        y = rem % s2
        x = rem // s2
        if np.any(x % g) or np.any(y % g):
            return None
        return (z * self.nx + x // g) * self.ny + y // g

    def with_spacing(self, grid_spacing: int) -> "GridPoolEvaluator":
        """Clone at a different grid spacing (e.g. stride-1 for full-slice
        inference) sharing the device-resident volumes."""
        ev = GridPoolEvaluator.__new__(GridPoolEvaluator)
        ev.__dict__.update(self.__dict__)
        ev.grid_spacing = int(grid_spacing)
        s1, s2, _ = self.orig_shape
        ev.nx = len(range(0, s1, ev.grid_spacing))
        ev.ny = len(range(0, s2, ev.grid_spacing))
        # keep patches-per-dispatch (and thus activation HBM) roughly what
        # the caller sized z_chunk for: a g=2 -> 1 re-space quadruples the
        # rows per slice, so the z-chunk shrinks by the same factor
        ev.z_chunk = max(1, (self.z_chunk * self.nx * self.ny)
                         // (ev.nx * ev.ny))
        return ev

    def _offgrid_dense_worthwhile(self, inds: np.ndarray) -> bool:
        """True when a stride-1 slab sweep over the touched z-slabs beats
        per-patch dynamic-slice gathers for this off-grid index set."""
        if not getattr(self, "offgrid_dense", True) or len(inds) == 0:
            return False
        s1, s2, s3 = self.orig_shape
        slabs = len(np.unique((np.asarray(inds, np.int64) % s3)
                              // self.z_chunk))
        return (len(inds) * _DENSE_OFFGRID_RATIO
                > slabs * s1 * s2 * self.z_chunk)

    def _eval_slabs(self, params, rows: np.ndarray, ops, mc, rng
                    ) -> Dict[str, np.ndarray]:
        """Slab-restricted host evaluation: one z-chunk dispatch per slab
        that contains requested rows (slabs with none are skipped), with
        the requested rows gathered ON DEVICE — index vectors bucket-pad
        to powers of two so the gather program set stays small — so only
        the selected rows' bytes cross the host link.  MC dropout keys
        fold the slab's global chunk id (``step_base``), so results are
        bitwise those of the whole-volume sweep."""
        rows = np.asarray(rows, np.int64)
        slab_rows = self.nx * self.ny * self.z_chunk
        slab_ids = rows // slab_rows
        results: Dict[str, np.ndarray] = {}
        for slab in np.unique(slab_ids):
            sel = np.nonzero(slab_ids == slab)[0]
            local = rows[sel] - slab * slab_rows
            z0 = int(slab) * self.z_chunk
            block = self._slices[z0:z0 + self.z_chunk]
            pad = self.z_chunk - block.shape[0]
            if pad:
                block = jnp.pad(block, ((0, pad), (0, 0), (0, 0), (0, 0)))
            outs = _grid_sweep_scan(self.spec, params, block,
                                    self._mu_c, self._sd_c,
                                    self.patch_shape,
                                    self.grid_spacing, self.z_chunk, ops,
                                    mc, rng, self.compute_dtype,
                                    step_base=int(slab))
            bucket = max(256, 1 << int(np.ceil(np.log2(len(local)))))
            idx = np.zeros(bucket, np.int32)
            idx[:len(local)] = local
            g = _gather_rows(tuple(outs), jnp.asarray(idx))
            for op, o in zip(ops, g):
                arr = np.asarray(o)[:len(local)]
                if op not in results:
                    results[op] = np.empty((len(rows),) + arr.shape[1:],
                                           arr.dtype)
                results[op][sel] = arr
        return results

    def _whole_sweep(self, params, ops, mc, rng):
        """Whole-volume sweep in one dispatch (pad + dispatch seams above).
        Returns one array per op, >= nz*nx*ny rows (padding rows trail and
        are trimmed by the caller)."""
        return self._dispatch_sweep(params, self._sweep_slices(), ops, mc,
                                    rng)

    def evaluate(self, params, pool_inds, ops: Sequence[str] = ("posteriors",),
                 mc_rng=None, as_device: bool = False, mask=None
                 ) -> Dict[str, np.ndarray]:
        if "loss" in ops:
            # label-dependent op: the base class handles the split and the
            # chunk-mean semantics (its non-loss remainder re-enters here)
            rest = tuple(o for o in ops if o != "loss")
            res = self.evaluate(params, pool_inds, rest, mc_rng,
                                as_device) if rest else {}
            res["loss"] = self._eval_loss(params, pool_inds, mask)
            return res
        rows = self._grid_rows(pool_inds) if self._sweep_ok else None
        if rows is None:
            # off-grid indices: a dense stride-1 slab sweep over the
            # touched z-slabs beats the per-patch arbitrary gather (~8x
            # per patch) once the set is big/clustered enough
            if not as_device and self._sweep_ok \
                    and self._offgrid_dense_worthwhile(pool_inds):
                ev1 = self if self.grid_spacing == 1 else self.with_spacing(1)
                return ev1.evaluate(params, pool_inds, ops, mc_rng)
            return super().evaluate(params, pool_inds, ops, mc_rng,
                                    as_device)
        ops = tuple(ops)
        mc = mc_rng is not None
        rng = mc_rng if mc else jax.random.key(0)
        n_valid = self.nz * self.nx * self.ny
        if not as_device and len(rows):
            n_slabs = -(-self.nz // self.z_chunk)
            needed = len(np.unique(np.asarray(rows, np.int64)
                                   // (self.nx * self.ny * self.z_chunk)))
            # wide ops always slab (bounds HBM to one z-chunk of the wide
            # tensor AND pulls only the requested rows); narrow ops slab
            # only when at least HALF the slabs can be skipped — on the
            # tunneled chip per-dispatch latency dominates, so trading one
            # whole-volume dispatch for n_slabs-1 slab dispatches to save
            # a sliver of compute is a regression
            if (set(ops) & _WIDE_OPS) or needed <= n_slabs // 2:
                return self._eval_slabs(params, rows, ops, mc, rng)
        # one dispatch for the whole volume
        outs = self._whole_sweep(params, ops, mc, rng)
        if as_device:
            rows_d = jnp.asarray(rows)
            return {op: o[:n_valid][rows_d]
                    for op, o in zip(ops, outs)}
        return {op: np.asarray(o)[:n_valid][rows]
                for op, o in zip(ops, outs)}
