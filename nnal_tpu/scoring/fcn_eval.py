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
all work.  Feature-space and gradient methods (core-set, fi, influence,
BADGE) need patch-level features/grads and raise a clear error instead.

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

        @partial(jax.jit, static_argnames=("mc",))
        def _run(params, state, x, mc, rng):
            if compute_dtype is not None:
                params = cast_float_params(params, compute_dtype)
                x = x.astype(compute_dtype)
            out = apply_cnn(spec, params, x, mc_dropout=mc,
                            dropout_rng=rng, state=state)
            return (out.posteriors.astype(jnp.float32), out.prediction)

        self._run = _run

    # ------------------------------------------------------------------ #
    def _sweep(self, params, mc_rng):
        """(Z, H, W, C) posteriors + (Z, H, W) predictions, on device."""
        posts, preds = [], []
        Z = self.slices.shape[0]
        rng = mc_rng if mc_rng is not None else jax.random.key(0)
        for lo in range(0, Z, self.batch):
            xs = self.slices[lo:lo + self.batch]
            p, pr = self._run(params, self.bn_state, xs,
                              mc=mc_rng is not None, rng=rng)
            posts.append(p)
            preds.append(pr)
        return jnp.concatenate(posts), jnp.concatenate(preds)

    def evaluate(self, params, pool_inds,
                 ops: Sequence[str] = ("posteriors",),
                 mc_rng=None, as_device: bool = False, mask=None
                 ) -> Dict[str, np.ndarray]:
        unsupported = [op for op in ops
                       if op not in ("posteriors", "prediction")]
        if unsupported:
            raise NotImplementedError(
                f"dense-model evaluator has no {unsupported} op — "
                "feature/gradient query methods (core-set, fi, influence, "
                "BADGE, rep-entropy) need the patch-wise evaluator")
        posts, preds = self._sweep(params, mc_rng)
        x, y, z = np.unravel_index(np.asarray(pool_inds, np.int64),
                                   self.orig_shape)
        zi, xi, yi = jnp.asarray(z), jnp.asarray(x), jnp.asarray(y)
        out = {}
        for op in ops:
            if op == "posteriors":
                # binary convention: the (n,) P(y=1) row (CLAUDE.md)
                vals = posts[zi, xi, yi, 1]
            else:
                vals = preds[zi, xi, yi]
            out[op] = vals if as_device else np.asarray(vals)
        return out

    def segment_volume(self, params, op: str = "prediction"):
        """(H, W, Z) dense output over the whole subject (serving parity
        with evaluation.inference.full_volume_patchwise)."""
        posts, preds = self._sweep(params, None)
        vol = posts[..., 1] if op == "posteriors" else preds
        return np.transpose(np.asarray(vol), (1, 2, 0))
