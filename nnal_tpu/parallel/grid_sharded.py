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

The subclass overrides only the base class's sweep seams — ``_pad_mult``
(z pads to a per-shard multiple of chunks), ``_sweep_slices`` (the
shard-split stack, padded + distributed ONCE at construction: the
volumes are immutable, and re-distributing hundreds of MB per round over
a tunnel costs seconds) and the ``_dispatch_*`` hooks — so all pad/trim
bookkeeping stays in ``grid_eval.py``.

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
the mesh (SURVEY §6).  The classification engine's disk-backed image
pools are separate machinery and ignore the key (documented in
MIGRATION.md; the engine warns).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
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
        # immutable across the campaign: pad + distribute ONCE (a
        # per-sweep device_put would re-ship the whole padded volume
        # every AL round — seconds over the tunnel at 16-25 MB/s)
        self._slices_sharded = jax.device_put(
            super()._sweep_slices(), NamedSharding(mesh, P("data")))
        self._mu_rep = self._replicated(self._mu_c)
        self._sd_rep = self._replicated(self._sd_c)

    # ------------------------------------------------------------ plumbing
    def _pad_mult(self) -> int:
        # each shard's block must hold whole z-chunks; chunk boundaries
        # then coincide with the single-device sweep's (z_chunk divides
        # both paddings), so per-chunk programs see bit-identical inputs
        return self._dp * self.z_chunk

    def _sweep_slices(self):
        return self._slices_sharded

    def _replicated(self, tree):
        return jax.device_put(tree, NamedSharding(self.mesh, P()))

    def _shard_fn(self, key, local, n_out):
        """Build (and cache) the jitted shard_map wrapper: params/stats/rng
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

    # ------------------------------------------------------ dispatch hooks
    def _dispatch_sweep(self, params, slices, ops, mc, rng):
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
        outs = fn(self._replicated(params), slices, self._mu_rep,
                  self._sd_rep, self._replicated(rng))
        return outs if isinstance(outs, tuple) else (outs,)

    def _dispatch_fim(self, params, slices, cd):
        spec, ps = self.spec, self.patch_shape
        g, zi = self.grid_spacing, self.z_chunk

        def local(params, block, mu, sd, _rng):
            return _grid_fim_sweep(spec, params, block, mu, sd, ps, g,
                                   zi, cd)

        fn = self._shard_fn(("fim", cd, g, zi), local, 3)
        return fn(self._replicated(params), slices, self._mu_rep,
                  self._sd_rep, self._replicated(jax.random.key(0)))

    def _dispatch_perturb(self, params, teacher_params, slices, rng,
                          measure, gaussian_std, rotation_angle):
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
        return fn(self._replicated((params, teacher_params)), slices,
                  self._mu_rep, self._sd_rep, self._replicated(rng))
