"""Dense-model (FCN) pool evaluation over grid voxel sets.

The v2 model family (Tiramisu / FC-DenseNet, ``spec.fcn``) predicts every
pixel of a slice in one forward pass, so pool scoring for dense models is
a whole-volume AXIAL SWEEP + gather — no patch extraction at all
(reference ``full_slice_segment``, eval_utils.py:104-237, driving
``PW_analyze_results``' dense evaluations).  This evaluator exposes the
same ``evaluate`` contract as :class:`~nnal_tpu.scoring.pool_eval.
PoolEvaluator`, so the engines and the MC helpers
(``mc_average_posteriors`` / ``mc_stack_posteriors``) drive dense models
unchanged — entropy, MC-entropy, BALD, BatchBALD, random and ps-random
all work, and the ``feature_layer`` op (the spec's per-PIXEL probe — for
Tiramisu the last full-resolution dense-block conv) serves the
feature-space family (core-set, rep-entropy, BADGE; reference feature
methods PW_NNAL.py:284-451 over eval_utils feature maps) — and fi runs
via hallucinated last-layer Fisher over the same probes
(scoring/fisher.hallucinated_class_grads).  Per-patch FULL-gradient
methods (influence, AU_4U) need patch-level loss gradients and raise a
clear error instead.

TPU-native shape: the normalized slice stack lives on device once; each
``evaluate`` runs the jitted batched forward over all Z slices (static
shapes -> one compile) and gathers the requested voxels' outputs.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.models.cnn import apply_cnn, cast_float_params


class FCNGridPoolEvaluator:
    """Whole-slice dense scoring of voxel index sets for ``spec.fcn``
    models."""

    def __init__(self, spec, vols, mu, sd, orig_shape, *, batch: int = 4,
                 compute_dtype=None, bn_state=None):
        assert getattr(spec, "fcn", False), "needs a dense-prediction spec"
        self.spec = spec
        self.orig_shape = tuple(orig_shape)
        self.patch_shape = (1, 1, 1)   # dense models consume raw slices
        self.batch = batch
        self.bn_state = bn_state
        H, W, Z = self.orig_shape
        # (Z, H, W, C) normalized slice stack, device-resident once
        stack = np.stack([(np.asarray(v, np.float32) - m) / s
                          for v, m, s in zip(vols, np.ravel(mu),
                                             np.ravel(sd))], axis=-1)
        self.slices = jnp.asarray(np.transpose(stack, (2, 0, 1, 3)))

        def _fwd(params, state, x, mc, rng):
            if compute_dtype is not None:
                params = cast_float_params(params, compute_dtype)
                x = x.astype(compute_dtype)
            return apply_cnn(spec, params, x, mc_dropout=mc,
                             dropout_rng=rng, state=state)

        @partial(jax.jit, static_argnames=("mc",))
        def _run(params, state, x, mc, rng):
            out = _fwd(params, state, x, mc, rng)
            return (out.posteriors.astype(jnp.float32), out.prediction)

        @partial(jax.jit, static_argnames=("mc",))
        def _run_feat(params, state, x, mc, rng):
            # separate program: feature sweeps are rare relative to
            # posterior sweeps, and adding an always-on feature output
            # would recompile (and add HBM writes to) the hot program
            out = _fwd(params, state, x, mc, rng)
            assert out.feature is not None, \
                "spec has no feature_layer probe"
            return out.feature.astype(jnp.float32)

        self._run = _run
        self._run_feat = _run_feat

    # ------------------------------------------------------------------ #
    def _batches(self, mc_rng):
        Z = self.slices.shape[0]
        rng = mc_rng if mc_rng is not None else jax.random.key(0)
        for lo in range(0, Z, self.batch):
            # per-batch key fold, matching the patch evaluators'
            # per-chunk discipline (grid_eval._grid_sweep): one shared
            # key would give slices at the same batch position identical
            # dropout masks, correlating MC posterior noise across slabs
            key = (jax.random.fold_in(rng, lo) if mc_rng is not None
                   else rng)
            yield self.slices[lo:lo + self.batch], key

    def _sweep(self, params, mc_rng):
        """(Z, H, W, C) posteriors + (Z, H, W) predictions, on device."""
        posts, preds = [], []
        for xs, key in self._batches(mc_rng):
            p, pr = self._run(params, self.bn_state, xs,
                              mc=mc_rng is not None, rng=key)
            posts.append(p)
            preds.append(pr)
        return jnp.concatenate(posts), jnp.concatenate(preds)

    def _sweep_features(self, params, mc_rng):
        """(Z, H, W, C_f) per-pixel probe activations, on device."""
        feats = [self._run_feat(params, self.bn_state, xs,
                                mc=mc_rng is not None, rng=key)
                 for xs, key in self._batches(mc_rng)]
        return jnp.concatenate(feats)

    def evaluate(self, params, pool_inds,
                 ops: Sequence[str] = ("posteriors",),
                 mc_rng=None, as_device: bool = False, mask=None
                 ) -> Dict[str, np.ndarray]:
        unsupported = [op for op in ops
                       if op not in ("posteriors", "prediction",
                                     "feature_layer")]
        if unsupported:
            raise NotImplementedError(
                f"dense-model evaluator has no {unsupported} op — "
                "per-patch full-gradient query methods (influence) need "
                "the patch-wise evaluator")
        x, y, z = np.unravel_index(np.asarray(pool_inds, np.int64),
                                   self.orig_shape)
        zi, xi, yi = jnp.asarray(z), jnp.asarray(x), jnp.asarray(y)
        need_pp = [op for op in ops if op != "feature_layer"]
        out = {}
        if need_pp:
            posts, preds = self._sweep(params, mc_rng)
            for op in need_pp:
                if op == "posteriors":
                    # binary convention: the (n,) P(y=1) row (CLAUDE.md);
                    # multiclass gets the full (n, c) matrix, mirroring
                    # pool_eval._eval_chunk — an unconditional [..., 1]
                    # would silently rank multiclass entropy/BALD on
                    # class-1 probs
                    vals = (posts[zi, xi, yi, 1]
                            if self.spec.nclass == 2
                            else posts[zi, xi, yi, :])
                else:
                    vals = preds[zi, xi, yi]
                out[op] = vals if as_device else np.asarray(vals)
        if "feature_layer" in ops:
            F = self._sweep_features(params, mc_rng)
            vals = F[zi, xi, yi, :]
            out["feature_layer"] = vals if as_device else np.asarray(vals)
        return out

    def segment_volume(self, params, op: str = "prediction"):
        """(H, W, Z) dense output over the whole subject (serving parity
        with evaluation.inference.full_volume_patchwise)."""
        posts, preds = self._sweep(params, None)
        vol = posts[..., 1] if op == "posteriors" else preds
        return np.transpose(np.asarray(vol), (1, 2, 0))
