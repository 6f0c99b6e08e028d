"""Mesh-sharded GridPoolEvaluator — config-driven multi-chip campaigns.

:class:`ShardedGridPoolEvaluator` is a drop-in for
``scoring.grid_eval.GridPoolEvaluator`` whose whole-volume sweeps
(``evaluate``'s single-dispatch path, ``fim_sweep``, ``perturb_sweep``)
run over the mesh's ``data`` axis: the slice stack shards by z, each
shard runs the SAME z-chunk ``lax.map`` as the single-device sweep —
identical per-chunk programs, MC-dropout/perturbation keys offset by the
shard's global chunk base — and the per-row outputs concatenate
row-major with no collectives (every grid row belongs to exactly one
shard).  The engines' selection logic therefore sees exactly the
single-device arrays; selections are bit-identical (parity tested on an
8-device CPU mesh, ``tests/test_sharded_evaluator.py``).

This is the engine-facing face of SURVEY §2.7 "pool sharding" (driver
config #5: sharded 1M-patch pool scoring in a full AL campaign): set the
``data_parallel`` config key and every grid-pool strategy — entropy, MC,
BALD, fi, AU_4U, ensemble/QBC committees, device-resident
core-set/rep-entropy features — scores its pool across the mesh.  The
reference has no counterpart (single tf.Session throughout,
PW_AL.py:196).

Out of scope by design: the slab-restricted host pulls and off-grid
gather fallbacks stay single-device (they are latency- not
throughput-bound), and the finetune stays replicated — labeled sets are
k-scale while pools are 10^5-10^6, so scoring is the only phase worth
the mesh (SURVEY §6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nnal_tpu.scoring.grid_eval import (
    GridPoolEvaluator,
    _grid_fim_sweep,
    _grid_perturb_sweep,
    _grid_sweep_scan,
)

__all__ = ["ShardedGridPoolEvaluator"]


class ShardedGridPoolEvaluator(GridPoolEvaluator):
    """GridPoolEvaluator whose whole-volume sweeps shard over ``mesh``."""

    def __init__(self, mesh: Mesh, *args, **kw):
        super().__init__(*args, **kw)
        self.mesh = mesh
        self._dp = int(mesh.shape["data"])
        self._sharded_fns = {}

    # ------------------------------------------------------------ plumbing
    def _z_sharded_slices(self):
        """Slice stack padded to a (dp * z_chunk)-multiple of z and laid
        out shard-split on the data axis.  Chunk boundaries coincide with
        the single-device sweep's (z_chunk divides both paddings), so
        per-chunk programs see bit-identical inputs."""
        z_pad = -self.nz % (self._dp * self.z_chunk)
        slices = self._slices
        if z_pad:
            slices = jnp.pad(slices, ((0, z_pad), (0, 0), (0, 0), (0, 0)))
        return jax.device_put(slices, NamedSharding(self.mesh, P("data")))

    def _replicated(self, tree):
        return jax.device_put(tree, NamedSharding(self.mesh, P()))

    def _shard_fn(self, key, local, n_out):
        """Build (and cache) the jitted shard_map wrapper: params/stats
        replicated, slices and every output split on ``data``."""
        if key not in self._sharded_fns:
            from jax.experimental.shard_map import shard_map

            out_specs = tuple(P("data") for _ in range(n_out))
            self._sharded_fns[key] = jax.jit(shard_map(
                local, mesh=self.mesh,
                in_specs=(P(), P("data"), P(), P(), P()),
                out_specs=out_specs if n_out > 1 else P("data"),
                check_rep=False))
        return self._sharded_fns[key]

    # ------------------------------------------------------------- sweeps
    def _whole_sweep(self, params, ops, mc, rng):
        spec, ps = self.spec, self.patch_shape
        g, zi, cd = self.grid_spacing, self.z_chunk, self.compute_dtype

        def local(params, block, mu, sd, rng):
            # global chunk ids keep MC dropout keys bitwise equal to the
            # single-device sweep's fold_in(rng, chunk)
            nsteps = block.shape[0] // zi
            base = jax.lax.axis_index("data") * nsteps
            return _grid_sweep_scan(spec, params, block, mu, sd, ps, g,
                                    zi, ops, mc, rng, cd, step_base=base)

        fn = self._shard_fn(("sweep", ops, mc, g, zi, cd), local, len(ops))
        outs = fn(self._replicated(params), self._z_sharded_slices(),
                  self._replicated(self._mu_c),
                  self._replicated(self._sd_c), self._replicated(rng))
        return outs if isinstance(outs, tuple) else (outs,)

    def fim_sweep(self, params, compute_dtype=None):
        cd = compute_dtype if compute_dtype is not None \
            else self.compute_dtype
        spec, ps = self.spec, self.patch_shape
        g, zi = self.grid_spacing, self.z_chunk

        def local(params, block, mu, sd, _rng):
            return _grid_fim_sweep(spec, params, block, mu, sd, ps, g,
                                   zi, cd)

        fn = self._shard_fn(("fim", cd, g, zi), local, 3)
        p1, unc, shrunk = fn(self._replicated(params),
                             self._z_sharded_slices(),
                             self._replicated(self._mu_c),
                             self._replicated(self._sd_c),
                             self._replicated(jax.random.key(0)))
        n_valid = self.nz * self.nx * self.ny
        return {"p1": np.asarray(p1)[:n_valid],
                "uncertainty": np.asarray(unc)[:n_valid],
                "shrunk": np.asarray(shrunk)[:n_valid]}

    def perturb_sweep(self, params, rng, teacher_params=None,
                      measure: str = "CE", gaussian_std=0.05,
                      rotation_angle=None) -> np.ndarray:
        spec, ps = self.spec, self.patch_shape
        g, zi, cd = self.grid_spacing, self.z_chunk, self.compute_dtype
        has_teacher = teacher_params is not None

        def local(params_pair, block, mu, sd, rng):
            params, teacher = params_pair
            nsteps = block.shape[0] // zi
            base = jax.lax.axis_index("data") * nsteps
            return _grid_perturb_sweep(spec, params, teacher, block, mu,
                                       sd, ps, g, zi, rng, measure,
                                       gaussian_std, rotation_angle, cd,
                                       step_base=base)

        fn = self._shard_fn(
            ("perturb", measure, gaussian_std, rotation_angle, has_teacher,
             g, zi, cd), local, 1)
        divs = fn(self._replicated((params, teacher_params)),
                  self._z_sharded_slices(), self._replicated(self._mu_c),
                  self._replicated(self._sd_c), self._replicated(rng))
        return np.asarray(divs)[:self.nz * self.nx * self.ny]
