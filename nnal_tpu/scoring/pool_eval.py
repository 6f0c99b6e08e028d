"""Batched pool evaluation — the rebuild of ``PW_NN.batch_eval``
(PW_NN.py:357-539).

The reference's pool sweep interleaves a Python patch-gather loop with one
``sess.run`` per batch (its hot loops 1+2, SURVEY.md §3.2).  Here each chunk
is a single jitted program: on-device patch gather + normalization fused into
the CNN forward; only the requested outputs (posterior column, entropy,
features, ...) return to host.  Chunks have one static size (``ntb``) so the
program compiles once; the ragged tail is padded and masked out.

MC-dropout passes reuse the same program with ``mc_dropout=True`` and a fresh
key per pass (the reference feeds ``keep_prob = dropout_rate`` at eval,
PW_NNAL.py:67-87).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.data.patches import gather_patches_normalized, patch_radii
from nnal_tpu.models.cnn import apply_cnn, cast_float_params


@partial(jax.jit, static_argnames=("spec", "patch_shape", "orig_shape",
                                   "ops", "mc", "cd"))
def _eval_chunk(spec, params, padded, inds, mu, sd, patch_shape, orig_shape,
                ops: Tuple[str, ...], mc: bool, rng, cd=None):
    x = gather_patches_normalized(padded, inds, mu, sd, patch_shape,
                                  orig_shape)
    if cd is not None:
        # bf16 storage forward: ~2x sweep throughput on the MXU; posteriors
        # still emerge in f32 (softmax upcasts the logits)
        x = x.astype(cd)
        params = cast_float_params(params, cd)
    out = apply_cnn(spec, params, x, mc_dropout=mc, dropout_rng=rng)
    res = {}
    for op in ops:
        if op == "posteriors":
            # binary models expose P(class 1) as a 1D score row, the
            # reference's convention for |p - .5| filters
            res[op] = out.posteriors[:, 1] if spec.nclass == 2 \
                else out.posteriors
        elif op == "posteriors_full":
            res[op] = out.posteriors
        elif op == "prediction":
            res[op] = out.prediction
        elif op == "feature_layer":
            res[op] = out.feature
        elif op == "logits":
            res[op] = out.logits
        else:
            raise ValueError(op)
    return res


@partial(jax.jit, static_argnames=("spec", "patch_shape", "orig_shape",
                                   "cd"))
def _loss_chunk(spec, params, padded, inds, labels_onehot, mu, sd,
                patch_shape, orig_shape, cd=None):
    """Per-patch CE loss for one chunk (the 'loss' op's device program —
    separate from ``_eval_chunk`` so the stable sweep programs and their
    persisted compile-cache entries are untouched)."""
    x = gather_patches_normalized(padded, inds, mu, sd, patch_shape,
                                  orig_shape)
    if cd is not None:
        x = x.astype(cd)
        params = cast_float_params(params, cd)
    out = apply_cnn(spec, params, x)
    logp = jax.nn.log_softmax(out.logits.astype(jnp.float32), axis=-1)
    return -jnp.sum(labels_onehot * logp, axis=-1)


def eval_compute_dtype(name):
    """Map the config's ``model.dtype`` string to an evaluator compute
    dtype: 'float32' (default, bit-parity with the numpy oracles) -> None;
    'bfloat16'/'bf16' -> bf16-storage sweeps (~2x throughput)."""
    if name in (None, "float32", "f32"):
        return None
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    raise ValueError(f"unsupported eval dtype {name!r}")


class PoolEvaluator:
    """Evaluate model outputs over arbitrary voxel-index sets of one subject.

    Holds the padded device-resident volumes + normalization constants, so
    repeated AL rounds re-sweep the pool without re-uploading data.
    """

    def __init__(self, spec, padded, mu, sd, patch_shape, orig_shape,
                 ntb: int = 4096, compute_dtype=None):
        self.spec = spec
        self.padded = jnp.asarray(padded)
        self.mu = jnp.asarray(np.asarray(mu, np.float32))
        self.sd = jnp.asarray(np.asarray(sd, np.float32))
        self.patch_shape = tuple(patch_shape)
        self.orig_shape = tuple(orig_shape)
        self.ntb = int(ntb)
        # None = f32 (bit-parity default); jnp.bfloat16 for throughput
        # (config.model.dtype routes here through the engines)
        self.compute_dtype = compute_dtype

    def evaluate(self, params, pool_inds,
                 ops: Sequence[str] = ("posteriors",),
                 mc_rng=None, as_device: bool = False, mask=None
                 ) -> Dict[str, np.ndarray]:
        """Sweep ``pool_inds`` in ntb-sized chunks; returns host arrays of
        length ``len(pool_inds)`` per requested op.  ``as_device`` keeps
        the outputs on device — essential for large feature sweeps
        (core-set's (pool, 4096) features round-tripping through host cost
        minutes per AL round over the tunnel).

        The 'loss' op needs ``mask`` (the label volume): each chunk's rows
        receive that chunk's MEAN CE vs the mask labels — the reference's
        broadcast-assignment semantics (``vals[batch_inds] = batch_vals``
        with a scalar ``model.loss``, PW_NN.py:529-535).  The reference's
        remaining ``batch_eval`` varname, 'hess_vecp', lives in
        ``scoring/influence`` (the HVP/CG machinery consumes it there)."""
        ops_in = tuple(ops)
        if "loss" in ops_in:
            rest = tuple(o for o in ops_in if o != "loss")
            res = self.evaluate(params, pool_inds, rest, mc_rng,
                                as_device) if rest else {}
            res["loss"] = self._eval_loss(params, pool_inds, mask)
            return res
        inds = np.asarray(pool_inds, dtype=np.int64)
        n = len(inds)
        ops = tuple(ops)
        mc = mc_rng is not None
        rng = mc_rng if mc else jax.random.key(0)
        chunks: Dict[str, list] = {op: [] for op in ops}
        for lo in range(0, n, self.ntb):
            chunk = inds[lo:lo + self.ntb]
            pad = self.ntb - len(chunk)
            if pad > 0:
                chunk = np.concatenate([chunk, np.zeros(pad, np.int64)])
            crng = jax.random.fold_in(rng, lo) if mc else rng
            res = _eval_chunk(self.spec, params, self.padded,
                              jnp.asarray(chunk), self.mu, self.sd,
                              self.patch_shape, self.orig_shape, ops, mc,
                              crng, self.compute_dtype)
            for op in ops:
                arr = res[op] if as_device else np.asarray(res[op])
                chunks[op].append(arr[:arr.shape[0] - pad] if pad else arr)
        cat = jnp.concatenate if as_device else np.concatenate
        return {op: cat(chunks[op], axis=0) for op in ops}

    def _eval_loss(self, params, pool_inds, mask) -> np.ndarray:
        """Chunk-mean CE per index (see ``evaluate``'s 'loss' op)."""
        from nnal_tpu.data.batching import make_onehot
        from nnal_tpu.data.patches import gather_labels

        assert mask is not None, "op='loss' needs the label mask"
        inds = np.asarray(pool_inds, dtype=np.int64)
        n = len(inds)
        vals = np.empty(n, np.float64)
        for lo in range(0, n, self.ntb):
            chunk = inds[lo:lo + self.ntb]
            nc = len(chunk)
            pad = self.ntb - nc
            labels = gather_labels(mask, chunk, self.orig_shape)
            y = make_onehot(np.asarray(labels, np.int64), self.spec.nclass)
            if pad > 0:
                chunk = np.concatenate([chunk, np.zeros(pad, np.int64)])
                y = np.concatenate([y, np.zeros((pad, y.shape[1]))])
            ce = _loss_chunk(self.spec, params, self.padded,
                             jnp.asarray(chunk), jnp.asarray(y, np.float32),
                             self.mu, self.sd, self.patch_shape,
                             self.orig_shape, self.compute_dtype)
            vals[lo:lo + nc] = float(np.mean(np.asarray(ce)[:nc]))
        return vals

    @classmethod
    def from_volumes(cls, spec, vols, stats, patch_shape, ntb=4096):
        from nnal_tpu.data.patches import pad_volumes

        orig_shape = tuple(np.asarray(vols[0]).shape)
        padded = pad_volumes(vols, patch_shape)
        stats = np.asarray(stats, dtype=np.float64)
        mu, sd = stats[:, 0], stats[:, 1]
        return cls(spec, padded, mu, sd, patch_shape, orig_shape, ntb)


def mc_average_posteriors(evaluator: PoolEvaluator, params, pool_inds,
                          mc_iters: int, base_rng) -> np.ndarray:
    """Running-averaged MC-dropout posteriors over the pool (reference
    accumulation ``(p + i*avg)/(i+1)``, PW_NNAL.py:67-87)."""
    avg = 0.0
    for i in range(mc_iters):
        rng = jax.random.fold_in(base_rng, i)
        p = evaluator.evaluate(params, pool_inds, ("posteriors",),
                               mc_rng=rng)["posteriors"]
        avg = (p + i * avg) / (i + 1)
    return avg


def mc_stack_posteriors(evaluator: PoolEvaluator, params, pool_inds,
                        mc_iters: int, base_rng) -> np.ndarray:
    """(T, n) stack of MC-dropout pool posteriors (for BALD)."""
    rows = []
    for i in range(mc_iters):
        rng = jax.random.fold_in(base_rng, i)
        rows.append(evaluator.evaluate(params, pool_inds, ("posteriors",),
                                       mc_rng=rng)["posteriors"])
    return np.stack(rows)
