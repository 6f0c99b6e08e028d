"""Full-volume inference.

Rebuild of the reference's two inference paths:

* patch-wise full-slice evaluation — every voxel of selected slices scored
  through the patch model (``full_slice_eval``/``full_model_probs``,
  PW_analyze_results.py:390-772) — here driven through the
  :class:`~nnal_tpu.scoring.pool_eval.PoolEvaluator` chunked sweep;
* FCN slice-batched segmentation (``full_slice_segment``,
  eval_utils.py:104-237) with ops prediction / posterior / MC-posterior /
  loss / aleatoric sigma, and the multi-size model dict
  (``models_dict_for_different_sizes``, eval_utils.py:413-439) — here
  unnecessary as one spec re-jits per input shape, kept as a thin cache.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.data.indexing import expand_raveled_inds
from nnal_tpu.models.cnn import cast_float_params, apply_cnn
from nnal_tpu.scoring.pool_eval import PoolEvaluator


def full_slice_patchwise(evaluator: PoolEvaluator, params,
                         slices: Sequence[int],
                         op: str = "prediction") -> Dict[int, np.ndarray]:
    """Score every voxel of the given axial slices with the patch model.
    Returns {slice_id: 2D array} (reference ``full_slice_eval``,
    PW_analyze_results.py:673-770).

    A grid evaluator is re-spaced to stride 1 so the dense sweep rides the
    im2col fast path instead of per-voxel gathers; all requested slices go
    through ONE evaluate call, so the grid path sweeps each touched z-slab
    once (the old per-slice loop re-swept the volume per slice).
    """
    from nnal_tpu.scoring.grid_eval import GridPoolEvaluator

    if isinstance(evaluator, GridPoolEvaluator) \
            and evaluator.grid_spacing != 1:
        evaluator = evaluator.with_spacing(1)
    s = evaluator.orig_shape
    slices = list(slices)
    if not slices:
        return {}
    inds2d = np.arange(s[0] * s[1])
    all_inds = np.concatenate(
        [expand_raveled_inds(inds2d, z, 2, s) for z in slices])
    vals = evaluator.evaluate(params, all_inds, (op,))[op]
    per = s[0] * s[1]
    return {z: np.asarray(vals[i * per:(i + 1) * per]).reshape(s[0], s[1])
            for i, z in enumerate(slices)}


def full_volume_patchwise(evaluator: PoolEvaluator, params,
                          op: str = "prediction") -> np.ndarray:
    s = evaluator.orig_shape
    planes = full_slice_patchwise(evaluator, params, range(s[2]), op)
    return np.stack([planes[z] for z in range(s[2])], axis=2)


class FCNInference:
    """Slice-batched FCN inference (reference ``full_slice_segment``,
    eval_utils.py:104-237).  The volume's axial slices are run through the
    dense-prediction model in batches; MC-posterior averages ``T``
    stochastic passes."""

    def __init__(self, spec, batch: int = 4, compute_dtype=None,
                 bn_state=None):
        assert spec.fcn, "FCNInference requires a dense-prediction spec"
        self.spec = spec
        self.batch = batch
        self.compute_dtype = compute_dtype
        # BN running statistics: without them, BN-bearing specs (DenseNet,
        # Tiramisu) normalize each inference batch with ITS OWN statistics
        # — non-reference semantics (eval_utils runs is_training=False on
        # the moving averages) whose output depends on batching
        self.bn_state = bn_state
        # close over the spec rather than jitting a bound method — hashing
        # ``self`` as a static arg invites silent recompiles

        @partial(jax.jit, static_argnames=("mc",))
        def _run(params, state, x, mc, rng):
            if compute_dtype is not None:
                # bf16-storage serving: ~2x dense-segmentation throughput;
                # posteriors still emerge in f32 (softmax upcasts logits)
                params = cast_float_params(params, compute_dtype)
                x = x.astype(compute_dtype)
            out = apply_cnn(spec, params, x, mc_dropout=mc,
                            dropout_rng=rng, state=state)
            return (out.posteriors.astype(jnp.float32), out.prediction,
                    out.log_sigma.astype(jnp.float32)
                    if out.log_sigma is not None else None,
                    out.logits.astype(jnp.float32))

        @jax.jit
        def _loss(params, state, x, y_onehot):
            from nnal_tpu.models.losses import fcn_cross_entropy

            out = apply_cnn(spec, params, x, state=state)

            def one(lg, yo):
                return fcn_cross_entropy(lg[None], yo[None])

            return jax.vmap(one)(out.logits, y_onehot)

        self._run = _run
        self._loss = _loss

    def segment(self, params, vol_slices: np.ndarray, op: str = "prediction",
                mc_T: int = 10, rng=None, labels=None):
        """``vol_slices``: (n, H, W, C) slice stack.  ``op`` covers the
        reference's full set (eval_utils.py:137-170): 'prediction',
        'posteriors', 'MC-posteriors', 'sigma', 'MC-sigma' (mean aleatoric
        sigma over ``mc_T`` stochastic passes), 'output' (raw logits), and
        'loss' (per-slice mean CE vs ``labels`` — (n, H, W, c) one-hot
        masks, NaN for unlabeled voxels)."""
        outs = []
        n = vol_slices.shape[0]
        rng = rng if rng is not None else jax.random.key(0)
        if op == "loss":
            assert labels is not None, "op='loss' needs one-hot labels"
        for lo in range(0, n, self.batch):
            xs = jnp.asarray(vol_slices[lo:lo + self.batch])
            if op in ("MC-posteriors", "MC-sigma"):
                acc = 0.0
                for t in range(mc_T):
                    post, _, sig, _ = self._run(
                        params, self.bn_state, xs, mc=True,
                        rng=jax.random.fold_in(rng, t))
                    val = post if op == "MC-posteriors" else jnp.exp(sig)
                    acc = (val + t * acc) / (t + 1)
                outs.append(np.asarray(acc))
            elif op == "loss":
                ys = jnp.asarray(labels[lo:lo + self.batch])
                outs.append(np.asarray(self._loss(params, self.bn_state,
                                                  xs, ys)))
            else:
                post, pred, sigma, logits = self._run(
                    params, self.bn_state, xs, mc=False, rng=rng)
                if op == "sigma":
                    # the head is log-sigma; the reference's op returns the
                    # aleatoric sigma itself (eval_utils.py:137-170)
                    outs.append(np.exp(np.asarray(sigma)))
                else:
                    outs.append(np.asarray({"prediction": pred,
                                            "posteriors": post,
                                            "output": logits}[op]))
        return np.concatenate(outs, axis=0)


class ShapeCachedFCN:
    """Re-jit cache keyed by input spatial shape (replaces the reference's
    ``models_dict_for_different_sizes``, eval_utils.py:413-439 — with XLA the
    'models' are just compiled programs per shape)."""

    def __init__(self, spec_factory, bn_state=None):
        self.spec_factory = spec_factory
        self.bn_state = bn_state
        self._cache: Dict = {}

    def for_shape(self, shape) -> FCNInference:
        shape = tuple(shape)
        if shape not in self._cache:
            self._cache[shape] = FCNInference(self.spec_factory(shape),
                                              bn_state=self.bn_state)
        return self._cache[shape]
