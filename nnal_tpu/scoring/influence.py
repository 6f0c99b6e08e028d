"""Influence-function scoring via Hessian-vector products.

Reference flow (Influence.py:369-453): build a double-backprop HVP op
(Pearlmutter trick, Influence.py:64-123), then solve
``argmin_t 1/2 t^T H t - v^T t`` (i.e. ``H t = v``, v = query-loss gradient)
with host-side ``scipy.fmin_ncg``, each objective/HVP evaluation batching
over training patches.

TPU-native rebuild: the HVP is ``jvp(grad(loss))`` — forward-over-reverse,
one fused XLA program over the whole training batch — and the solve is
conjugate gradients in a ``lax.while_loop`` entirely on device.  A
``scipy`` Newton-CG path is kept behind the same seam for parity checks.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from nnal_tpu.models.cnn import apply_cnn


def make_loss(spec):
    """Mean CE loss over a batch, as a function of params."""
    def loss(params, x, y_onehot):
        out = apply_cnn(spec, params, x)
        logp = jax.nn.log_softmax(out.logits, axis=-1)
        return -jnp.mean(jnp.sum(y_onehot * logp, axis=-1))
    return loss


def make_weighted_loss(spec):
    """Weighted-mean CE: zero-weight rows are exact no-ops, so a growing
    labeled set can be bucket-padded to a stable shape (one compile per
    bucket instead of one per AL round)."""
    def loss(params, x, y_onehot, w):
        out = apply_cnn(spec, params, x)
        logp = jax.nn.log_softmax(out.logits, axis=-1)
        per = -jnp.sum(y_onehot * logp, axis=-1)
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)
    return loss


@partial(jax.jit, static_argnames=("spec",))
def loss_grad(spec, params, x, y_onehot):
    """Gradient of the batch loss (reference ``add_loss_grad``,
    NN.py:862-871)."""
    return jax.grad(make_loss(spec))(params, x, y_onehot)


@partial(jax.jit, static_argnames=("spec",))
def weighted_loss_grad(spec, params, x, y_onehot, w):
    """Gradient of the weighted-mean batch loss: zero-weight (padding) rows
    contribute exactly nothing, unlike a plain mean over a padded batch."""
    return jax.grad(make_weighted_loss(spec))(params, x, y_onehot, w)


@partial(jax.jit, static_argnames=("spec",))
def hvp(spec, params, x, y_onehot, v, w=None):
    """Hessian-vector product via forward-over-reverse ``jvp(grad)`` —
    the same big-O as backprop, no double-backprop graph surgery
    (replaces Influence.py:64-123).  ``w`` enables zero-weight padding."""
    if w is None:
        g = lambda p: jax.grad(make_loss(spec))(p, x, y_onehot)
    else:
        g = lambda p: jax.grad(make_weighted_loss(spec))(p, x, y_onehot, w)
    _, Hv = jax.jvp(g, (params,), (v,))
    return Hv


def _tree_dot(a, b):
    leaves = jax.tree_util.tree_map(
        lambda u, w: jnp.sum(u.astype(jnp.float64 if u.dtype == jnp.float64
                                      else jnp.float32) * w), a, b)
    return jax.tree_util.tree_reduce(jnp.add, leaves)


@partial(jax.jit, static_argnames=("spec", "max_iter"))
def cg_solve_hvp(spec, params, x, y_onehot, v, damping: float = 0.01,
                 max_iter: int = 50, tol: float = 1e-6, w=None):
    """Solve ``(H + damping I) t = v`` by conjugate gradients with the jitted
    HVP as the matvec; the whole Krylov loop runs on device
    (replaces scipy.fmin_ncg at Influence.py:445)."""
    def matvec(t):
        Hv = hvp(spec, params, x, y_onehot, t, w)
        return jax.tree_util.tree_map(lambda h, ti: h + damping * ti, Hv, t)

    t0 = jax.tree_util.tree_map(jnp.zeros_like, v)
    r0 = v
    p0 = r0
    rs0 = _tree_dot(r0, r0)
    # RELATIVE stopping threshold: an absolute one silently skipped the
    # whole loop for small-norm query gradients (late-round well-fit
    # models), returning s_test = 0 and degenerating every influence
    # ranking to the uncertainty-filter order.
    rs_stop = tol * jnp.maximum(rs0, 1e-30)

    # truncated CG: the CE Hessian is indefinite in general; on detecting
    # non-positive curvature (p^T (H + damping) p <= 0) the iteration exits
    # with the current iterate — standard Newton-CG behavior, matching the
    # reference's fmin_ncg curvature handling.  On FIRST-iteration negative
    # curvature fmin_ncg falls back to the steepest-descent direction (the
    # RHS v), not the zero vector — mirrored here.
    def cond(carry):
        _, _, _, rs, i, done = carry
        return jnp.logical_and(jnp.logical_and(i < max_iter, rs > rs_stop),
                               jnp.logical_not(done))

    def body(carry):
        t, r, p, rs, i, done = carry
        Ap = matvec(p)
        pAp = _tree_dot(p, Ap)
        neg_curv = pAp <= 1e-12
        first_neg = jnp.logical_and(neg_curv, i == 0)
        alpha = jnp.where(neg_curv, 0.0, rs / jnp.where(neg_curv, 1.0, pAp))
        t = jax.tree_util.tree_map(
            lambda a, b: jnp.where(first_neg, b, a + alpha * b), t, p)
        r = jax.tree_util.tree_map(lambda a, b: a - alpha * b, r, Ap)
        rs_new = _tree_dot(r, r)
        beta = rs_new / jnp.maximum(rs, 1e-30)
        p = jax.tree_util.tree_map(lambda a, b: a + beta * b, r, p)
        return t, r, p, rs_new, i + 1, neg_curv

    t, _, _, _, _, _ = jax.lax.while_loop(
        cond, body, (t0, r0, p0, rs0, jnp.asarray(0), jnp.asarray(False)))
    return t


def s_test(spec, params, train_x, train_y_onehot, query_x, query_y_onehot,
           damping: float = 0.01, max_iter: int = 50, bucket: int = 256,
           n_valid=None, q_n_valid=None):
    """Influence s_test vector: ``(H_train + damping)^{-1} grad L(query)``
    (reference ``PW_sample_influence``, Influence.py:369-453).

    The training set is bucket-padded with zero-weight rows so the whole
    CG+HVP program compiles once per bucket — the labeled set grows every
    AL round, and per-round recompiles dominated round latency on the
    remote TPU compiler.  ``n_valid`` marks the logical count when the
    caller pre-padded the arrays; ``q_n_valid`` does the same for the query
    side: when set, v is the *weighted* mean gradient over the first
    ``q_n_valid`` rows, so padding rows are exact no-ops in v as well as in
    H (an unweighted mean over a padded query batch lets the artificial
    rows' gradients dominate v and skew every influence ranking)."""
    qx = jnp.asarray(query_x)
    qy = jnp.asarray(query_y_onehot)
    if q_n_valid is not None:
        qw = jnp.asarray(np.arange(qx.shape[0]) < int(q_n_valid),
                         jnp.float32)
        v = weighted_loss_grad(spec, params, qx, qy, qw)
    else:
        v = loss_grad(spec, params, qx, qy)
    tx = jnp.asarray(train_x)
    ty = jnp.asarray(train_y_onehot)
    n = tx.shape[0] if n_valid is None else int(n_valid)
    pad = -tx.shape[0] % bucket
    if pad:
        tx = jnp.concatenate([tx, jnp.zeros((pad,) + tx.shape[1:],
                                            tx.dtype)])
        ty = jnp.concatenate([ty, jnp.zeros((pad,) + ty.shape[1:],
                                            ty.dtype)])
    w = jnp.asarray(np.arange(tx.shape[0]) < n, jnp.float32)
    return cg_solve_hvp(spec, params, tx, ty, v, damping, max_iter, w=w)


@partial(jax.jit, static_argnames=("spec",))
def influence_scores_jvp(spec, params, s_test_vec, xs, ys):
    """``-<grad L(z_i), s_test>`` for EVERY row in one forward-mode sweep.

    Identity: the jvp of the per-sample loss VECTOR along ``s_test`` is
    exactly the vector of per-sample gradient dot products —
    ``d/de [L(theta + e*s; x_i)]_i = <grad L(z_i), s>`` — so one batched
    forward-mode pass replaces a per-sample backward (the reference ran
    one sess.run per sample, Influence.py:168-201; the first rebuild
    vmapped per-sample grads in 64-chunks).  Single dispatch, no
    per-sample gradient materialization."""
    def per_sample_losses(p):
        out = apply_cnn(spec, p, xs)
        logp = jax.nn.log_softmax(out.logits, axis=-1)
        return -jnp.sum(ys * logp, axis=-1)

    _, tang = jax.jvp(per_sample_losses, (params,), (s_test_vec,))
    return -tang


@partial(jax.jit, static_argnames=("spec",))
def _chunk_influence(spec, params, s_test_vec, xs, ys):
    """vmap(grad)-per-sample oracle for :func:`influence_scores_jvp`
    (kept for the equality test; the jvp sweep is the production path)."""
    def one(xi, yi):
        g = jax.grad(make_loss(spec))(params, xi[None], yi[None])
        return -_tree_dot(g, s_test_vec)
    return jax.vmap(one)(xs, ys)


def influence_scores(spec, params, s_test_vec, pool_x, pool_y_onehot,
                     bucket: int = 256) -> np.ndarray:
    """Per-pool-sample influence ``-<grad L(z_i), s_test>`` — one
    forward-mode jvp sweep over the bucket-padded candidate batch
    (padding rows are zero patches whose scores are sliced off; the
    candidate count B is round-invariant, so one compile serves the whole
    campaign)."""
    pool_x = np.asarray(pool_x)
    pool_y = np.asarray(pool_y_onehot)
    n = pool_x.shape[0]
    pad = -n % bucket
    if pad:
        pool_x = np.concatenate(
            [pool_x, np.zeros((pad,) + pool_x.shape[1:], pool_x.dtype)])
        pool_y = np.concatenate(
            [pool_y, np.zeros((pad,) + pool_y.shape[1:], pool_y.dtype)])
    vals = np.asarray(influence_scores_jvp(spec, params, s_test_vec,
                                           jnp.asarray(pool_x),
                                           jnp.asarray(pool_y)))
    return vals[:n]


def scipy_newton_cg_s_test(spec, params, train_x, train_y, v,
                           damping: float = 0.01):
    """Host Newton-CG parity path (the reference's solver seam,
    Influence.py:445) — minimizes ``1/2 t^T (H+damping) t - v^T t`` with
    scipy, calling the jitted HVP for Hessian-vector products."""
    from scipy.optimize import fmin_ncg

    flat_v, unravel = ravel_pytree(v)
    train_x = jnp.asarray(train_x)
    train_y = jnp.asarray(train_y)

    def f(t):
        tt = unravel(jnp.asarray(t, jnp.float32))
        Ht = hvp(spec, params, train_x, train_y, tt)
        flat_Ht, _ = ravel_pytree(Ht)
        return float(0.5 * np.dot(t, np.asarray(flat_Ht) + damping * t)
                     - np.dot(np.asarray(flat_v), t))

    def fprime(t):
        tt = unravel(jnp.asarray(t, jnp.float32))
        Ht = hvp(spec, params, train_x, train_y, tt)
        flat_Ht, _ = ravel_pytree(Ht)
        return np.asarray(flat_Ht) + damping * t - np.asarray(flat_v)

    def fhess_p(t, p):
        pp = unravel(jnp.asarray(p, jnp.float32))
        Hp = hvp(spec, params, train_x, train_y, pp)
        flat_Hp, _ = ravel_pytree(Hp)
        return np.asarray(flat_Hp) + damping * p

    t0 = np.asarray(flat_v)
    sol = fmin_ncg(f, t0, fprime=fprime, fhess_p=fhess_p, disp=False,
                   avextol=1e-8)
    return unravel(jnp.asarray(sol, jnp.float32))
