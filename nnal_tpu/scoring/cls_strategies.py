"""Classification (multi-class) query strategies.

Rebuild of ``NNAL.CNN_query`` (NNAL.py:188-525): random, entropy, EGL
(expected gradient length — repaired; the reference's path references
undefined variables, SURVEY.md §2.9), FI with SDP, rep-entropy — plus
TPU-native extras with no reference counterpart, giving the classification
engine the same strategy surface as the patch-wise engines: multi-class
BADGE (Ash et al. ICLR 2020), the MC-dropout family (MC-entropy, BALD,
BatchBALD), committee methods (ensemble, QBC-JS), core-set, and influence
— each in its multiclass form.  Operates on in-memory ``(X, labels)``
arrays through jitted batched forwards — the classification analogue of
the patch-pool evaluator.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.models.cnn import apply_cnn
from nnal_tpu.scoring.fisher import a_matrices_multiclass, refine_feature_matrix
from nnal_tpu.scoring.gradients import shrunk_class_grads
from nnal_tpu.scoring.pmf import sample_query_pmf
from nnal_tpu.scoring.representative import cosine_similarity, rep_entropy_select
from nnal_tpu.scoring.sdp import fi_query_distribution
from nnal_tpu.scoring.uncertainty import uncertainty_filter


@dataclass
class ClsQueryContext:
    spec: object
    params: Dict
    pool_x: np.ndarray               # (n, ...) candidate inputs
    k: int
    rng: np.random.Generator
    B: int = 200
    lambda_: float = 0.0
    batch: int = 1024
    MC_iters: int = 10               # MC-dropout passes (extras family)
    labeled_x: Optional[object] = None   # current train inputs (core-set,
    labeled_y: Optional[np.ndarray] = None  # influence); array-like view
    committee_params: Optional[list] = None  # ensemble/QBC-JS members
    bn: Optional[Dict] = None            # BN running stats (eval mode)
    extra: Dict = field(default_factory=dict)


from functools import partial


@partial(jax.jit, static_argnames=("spec",))
def _fwd(spec, params, x, state=None):
    # module-level jit: a per-call ``jax.jit(lambda ...)`` closure compiled
    # a fresh program every invocation even at identical shapes
    return apply_cnn(spec, params, x, state=state)


@partial(jax.jit, static_argnames=("spec",))
def _fwd_mc(spec, params, x, rng, state=None):
    # MC-dropout stochastic pass (reference feeds keep_prob=dropout_rate
    # at eval, PW_NNAL.py:67-87 — the classification analogue); BN (when
    # the spec has it) stays in eval mode on the running stats
    return apply_cnn(spec, params, x, mc_dropout=True, dropout_rng=rng,
                     state=state)


def batched_forward(spec, params, X, batch: int, what=("posteriors",),
                    mc_rng=None, as_device: bool = False, state=None):
    """Static-shape chunked forward over an array pool (the classification
    analogue of PW_NN.batch_eval; reference idxBatch_posteriors,
    NNAL_tools.py:382).  ``mc_rng`` makes the pass stochastic (MC dropout),
    with a per-chunk fold so chunking does not alias masks.

    ``as_device`` keeps the outputs in HBM (device-residency rule: the
    (pool, 4096) feature matrix is ~100 MB — pulling it through the
    tunnel at 16-25 MB/s costs seconds per AL round, and core-set /
    rep-entropy consume it on device anyway)."""
    outs = {w: [] for w in what}
    n = X.shape[0]
    for lo in range(0, n, batch):
        xs = np.asarray(X[lo:lo + batch])
        pad = batch - xs.shape[0]
        if pad > 0:
            xs = np.concatenate([xs, np.zeros((pad,) + xs.shape[1:],
                                              xs.dtype)])
        if mc_rng is None:
            out = _fwd(spec, params, jnp.asarray(xs), state)
        else:
            out = _fwd_mc(spec, params, jnp.asarray(xs),
                          jax.random.fold_in(mc_rng, lo), state)
        for w in what:
            dev = {"posteriors": out.posteriors,
                   "prediction": out.prediction,
                   "feature_layer": out.feature}[w]
            if pad:
                dev = dev[:dev.shape[0] - pad]
            outs[w].append(dev if as_device else np.asarray(dev))
    cat = jnp.concatenate if as_device else np.concatenate
    return {w: cat(v) for w, v in outs.items()}


def _entropy_np(p: np.ndarray) -> np.ndarray:
    """Shannon entropy over the last axis (host numpy — in-memory cls
    pools are small, and host math is shape-stable by construction)."""
    return -(p * np.log(np.maximum(p, 1e-12))).sum(-1)


def cls_query(ctx: ClsQueryContext, method_name: str) -> np.ndarray:
    """Returns positions into ``ctx.pool_x`` (reference NNAL.CNN_query)."""
    n = ctx.pool_x.shape[0]

    if method_name == "random":
        return ctx.rng.permutation(n)[:ctx.k]

    if method_name in ("MC-entropy", "BALD", "BatchBALD"):
        # MC-dropout family — classification extras (the reference's cls
        # dispatch has none; these mirror the patch-wise strategies in
        # their multiclass forms).  The key derives from the method's
        # host rng stream so journal replay is deterministic.
        key = jax.random.key(int(ctx.rng.integers(2 ** 31 - 1)))
        stack = np.stack([
            batched_forward(ctx.spec, ctx.params, ctx.pool_x, ctx.batch,
                            mc_rng=jax.random.fold_in(key, t),
                            state=ctx.bn)["posteriors"]
            for t in range(ctx.MC_iters)])                   # (T, n, C)
        if method_name == "MC-entropy":
            avg = 0.0
            for i in range(stack.shape[0]):   # reference's running mean
                avg = (stack[i] + i * avg) / (i + 1)
            return np.asarray(uncertainty_filter(avg, ctx.k))
        # multiclass BALD scores on host numpy (see _entropy_np)
        s = stack.astype(np.float64)
        bald = _entropy_np(s.mean(0)) - _entropy_np(s).mean(0)
        if method_name == "BALD":
            return np.argsort(-bald, kind="stable")[:ctx.k]
        from nnal_tpu.scoring.batchbald import batchbald_select_probs
        from nnal_tpu.scoring.strategies import _BB_CFG_FOLD

        Bc = min(ctx.B, n)
        sel = np.argsort(-bald, kind="stable")[:Bc]
        chosen = np.asarray(batchbald_select_probs(
            jnp.asarray(stack[:, sel]), min(ctx.k, Bc),
            jax.random.fold_in(key, _BB_CFG_FOLD)))
        return sel[chosen]

    if method_name in ("ensemble", "QBC-JS"):
        # committee methods — classification extras mirroring the
        # patch-wise pair (reference PW_NNAL.py:453-545 is patch-wise
        # only; the cls dispatch, NNAL.py:188-525, never had them):
        # posteriors across the committee, then entropy of the
        # running-mean average (ensemble) or Jensen-Shannon disagreement
        # H(avg) - avg(H) (QBC-JS)
        assert ctx.committee_params, \
            f"{method_name} needs ctx.committee_params (engine-built)"
        stack = np.stack([
            # committee members share the main model's BN stats (members
            # are short finetunes of it; per-member stats would cost a
            # refresh pass each)
            batched_forward(ctx.spec, p, ctx.pool_x,
                            ctx.batch, state=ctx.bn)["posteriors"]
            for p in ctx.committee_params])              # (E, n, C)
        if method_name == "ensemble":
            avg = 0.0
            for i in range(stack.shape[0]):   # reference's running mean
                avg = (stack[i] + i * avg) / (i + 1)
            return np.asarray(uncertainty_filter(avg, ctx.k))
        s = stack.astype(np.float64)
        js = _entropy_np(s.mean(0)) - _entropy_np(s).mean(0)
        return np.argsort(-js, kind="stable")[:ctx.k]

    if method_name == "core-set":
        # greedy k-center on pool features vs labeled features — the
        # classification form of reference PW_NNAL.py:353-451 (the cls
        # dispatch never had it); features stay on device end-to-end
        from nnal_tpu.scoring.representative import (
            core_set_select,
            cross_max_similarities,
            normalize_rows,
            pad_rows,
        )

        F_u = batched_forward(
            ctx.spec, ctx.params, ctx.pool_x, ctx.batch,
            ("feature_layer",), as_device=True,
            state=ctx.bn)["feature_layer"]
        # bucket-pad the pool side (shape-stability rule); pads get
        # sims0=+inf so the k-center argmin can never pick them
        F_u, n_u = pad_rows(F_u)
        Fn = normalize_rows(F_u)
        if ctx.labeled_x is not None and len(ctx.labeled_x) > 0:
            F_t = batched_forward(
                ctx.spec, ctx.params, ctx.labeled_x, ctx.batch,
                ("feature_layer",), as_device=True,
                state=ctx.bn)["feature_layer"]
            sims0 = jnp.asarray(cross_max_similarities(F_u, F_t,
                                                       as_device=True,
                                                       keep_pad=True))
        else:
            sims0 = jnp.full((F_u.shape[0],), -jnp.inf)
        sims0 = jnp.where(jnp.arange(F_u.shape[0]) < n_u, sims0, jnp.inf)
        return np.asarray(core_set_select(Fn, sims0, min(ctx.k, n)))

    posts = batched_forward(ctx.spec, ctx.params, ctx.pool_x,
                            ctx.batch, state=ctx.bn)["posteriors"]

    if method_name == "entropy":
        # bucket-padded filter (shape-stability rule): a direct
        # shannon_entropy over the pool-length array recompiled every
        # round as the pool shrank; ranking/tie-break is identical.
        # posts stays a NUMPY array so the bucket pad happens on host —
        # an eager jnp.concatenate would compile per pool length.
        return np.asarray(uncertainty_filter(posts, ctx.k))

    B = min(ctx.B, n)
    sel = np.asarray(uncertainty_filter(posts, B))

    if method_name == "influence":
        # influence querying over (X, labels) arrays — the classification
        # form of the patch-wise strategy (reference PW_sample_influence,
        # Influence.py:369-453): s_test = (H_train + damping)^-1
        # grad L(labeled set); the B most-uncertain candidates ranked by
        # |<grad L(z at its pseudo-label), s_test>|.  The labeled set is
        # bucket-padded (zero-weight rows in BOTH H and v — exact no-ops)
        # so the CG+HVP program compiles once per bucket as the set grows.
        from nnal_tpu.data.batching import make_onehot
        from nnal_tpu.scoring.influence import influence_scores
        from nnal_tpu.scoring.strategies import _s_test_dispatch

        assert ctx.labeled_x is not None and len(ctx.labeled_x) > 0, \
            "influence querying needs ctx.labeled_x / ctx.labeled_y"
        n_tr = len(ctx.labeled_x)
        pad = -n_tr % 256
        tx = np.asarray(ctx.labeled_x[:])
        if pad:
            tx = np.concatenate(
                [tx, np.zeros((pad,) + tx.shape[1:], tx.dtype)])
        y = np.zeros(n_tr + pad, np.int64)
        y[:n_tr] = np.asarray(ctx.labeled_y, np.int64)
        ty = make_onehot(y, ctx.spec.nclass)
        key = jax.random.key(int(ctx.rng.integers(2 ** 31 - 1)))
        st = _s_test_dispatch(ctx.extra, ctx.spec, ctx.params,
                              jnp.asarray(tx), jnp.asarray(ty),
                              float(ctx.extra.get("damping", 0.1)),
                              n_tr, key)
        cx = np.asarray(ctx.pool_x[sel])
        pseudo = np.argmax(posts[sel], axis=1).astype(np.int64)
        cy = make_onehot(pseudo, ctx.spec.nclass)
        scores = influence_scores(ctx.spec, ctx.params, st, cx, cy)
        return sel[np.argsort(-np.abs(scores), kind="stable")[:ctx.k]]

    if method_name == "egl":
        # expected gradient length: sum_c p_c ||shrunk grad_c||^2 over the
        # uncertainty-filtered candidates (reference NNAL.py:234-292,
        # repaired — its per-sample session loop referenced dead variables)
        shrunk = shrunk_class_grads(ctx.spec, ctx.params,
                                    jnp.asarray(ctx.pool_x[sel]))
        norms = jnp.sum(shrunk ** 2, axis=-1)          # (B, c)
        scores = np.asarray(jnp.sum(jnp.asarray(posts[sel]) * norms, axis=1))
        return sel[np.argsort(-scores, kind="stable")[:ctx.k]]

    if method_name == "fi":
        shrunk = shrunk_class_grads(ctx.spec, ctx.params,
                                    jnp.asarray(ctx.pool_x[sel]))
        A = a_matrices_multiclass(shrunk, jnp.asarray(posts[sel],
                                                      jnp.float32))
        X_pool = None
        if ctx.lambda_ > 0:
            F = batched_forward(ctx.spec, ctx.params, ctx.pool_x[sel],
                                ctx.batch, ("feature_layer",),
                                state=ctx.bn)["feature_layer"]
            ref_F = refine_feature_matrix(F.T, B)
            X_pool = ref_F - ref_F.mean(axis=1, keepdims=True)
        q = fi_query_distribution(np.asarray(A), ctx.lambda_, X_pool, ctx.k)
        picks = sample_query_pmf(q, ctx.k, ctx.rng, replacement=True)
        return sel[picks]

    if method_name == "rep-entropy":
        from nnal_tpu.scoring.representative import rep_entropy_from_features

        F = batched_forward(ctx.spec, ctx.params, ctx.pool_x, ctx.batch,
                            ("feature_layer",), as_device=True,
                            state=ctx.bn)["feature_layer"]
        rest = np.setdiff1d(np.arange(n), sel)
        if len(rest) == 0:
            return sel[:ctx.k]
        chosen = rep_entropy_from_features(F, rest, sel, min(ctx.k, B))
        return sel[chosen]

    if method_name == "BADGE":
        # multi-class BADGE (a TPU-native extra, Ash et al. ICLR 2020):
        # k-means++ over the candidates' (C*d) hallucinated-label
        # last-layer gradient embeddings.  The key derives from the
        # method's host rng stream, so journal replay is deterministic.
        from nnal_tpu.scoring.representative import (
            badge_embeddings_multiclass,
            badge_kmeanspp,
        )

        F = batched_forward(ctx.spec, ctx.params, ctx.pool_x[sel],
                            ctx.batch, ("feature_layer",),
                            state=ctx.bn)["feature_layer"]
        E = badge_embeddings_multiclass(jnp.asarray(F),
                                        jnp.asarray(posts[sel]))
        key = jax.random.key(int(ctx.rng.integers(2 ** 31 - 1)))
        chosen = np.asarray(badge_kmeanspp(E, min(ctx.k, len(sel)), key))
        return sel[chosen]

    raise ValueError(method_name)


# --------------------------------------------------------------------------- #
# softmax-regression FI harness (reference MNIST comparison, NNAL.py:18-186,
# NNAL_tools.py:116-360): closed-form FI score for linear-softmax models
# --------------------------------------------------------------------------- #
@jax.jit
def linear_softmax_fi_scores(X: jnp.ndarray, posts: jnp.ndarray):
    """FI utility ``(||x||^2 + 1)(1 - ||p||^2)`` per sample (the closed form
    the reference's MNIST harness ranks by)."""
    xn = jnp.sum(X.reshape(X.shape[0], -1) ** 2, axis=1)
    pn = jnp.sum(posts ** 2, axis=1)
    return (xn + 1.0) * (1.0 - pn)
