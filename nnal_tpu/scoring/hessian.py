"""Closed-form last-layer gradients/Hessian for softmax+FC heads.

Reference: ``LLFC_grads`` / ``LLFC_hess`` (NN.py:874-1029, duplicated at
model_utils.py:137-292) — used by the LiSSA influence approximation
(PW_NNAL.py:851-881).  For a last layer ``z = W^T a + b`` with softmax
posterior ``p`` and cross-entropy loss at label ``y``:

    dJ/dz = p - y
    dJ/dW = a (p - y)^T          dJ/db = p - y
    H_z   = diag(p) - p p^T
    H over theta=(vec(W), b) has the Kronecker structure
        H = H_z (x) [[a a^T, a], [a^T, 1]]

All batched with einsum on device; verified against autodiff in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def llfc_grads(a: jnp.ndarray, p: jnp.ndarray, y_onehot: jnp.ndarray):
    """Per-sample last-layer CE gradients.

    ``a``: (b, d) last-layer inputs; ``p``: (b, c) posteriors; returns
    ``(dW, db)`` with shapes (b, d, c), (b, c)."""
    dz = p - y_onehot
    dW = jnp.einsum("bd,bc->bdc", a, dz)
    return dW, dz


@jax.jit
def llfc_hess(a: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Per-sample last-layer Hessian over theta = (vec(W), b).

    Returns (b, (d+1)c, (d+1)c) using the Kronecker structure
    ``H = H_z (x) aa1`` where ``aa1 = [[a a^T, a], [a^T, 1]]``.  The
    parameter ordering is W's d rows (each of width c) then b, i.e.
    theta = [W[0,:], ..., W[d-1,:], b]."""
    b, d = a.shape
    c = p.shape[1]
    Hz = jnp.einsum("bc,ce->bce", p, jnp.eye(c)) \
        - jnp.einsum("bc,be->bce", p, p)
    ones = jnp.ones((b, 1), a.dtype)
    a1 = jnp.concatenate([a, ones], axis=1)          # (b, d+1)
    aa1 = jnp.einsum("bi,bj->bij", a1, a1)           # (b, d+1, d+1)
    # kron(aa1, Hz): index (i*c + u, j*c + v)
    H = jnp.einsum("bij,buv->biujv", aa1, Hz)
    return H.reshape(b, (d + 1) * c, (d + 1) * c)


@partial(jax.jit, static_argnames=("max_iter",))
def lissa_influence(grads_q: jnp.ndarray, hess_samples: jnp.ndarray,
                    max_iter: int = 100, scale: float = 50.0) -> jnp.ndarray:
    """LiSSA-style stochastic inverse-Hessian-vector iteration
    ``V <- g + V - H_t V / scale`` (reference ``stoch_approx_IF``,
    PW_NNAL.py:851-881), with per-step single-sample Hessians supplied as a
    ``(T, D, D)`` stack (pre-sampled on host for replayability).

    ``grads_q``: (D, m) query-gradient columns.  Returns V approximating
    ``scale * H^{-1} g``.
    """
    def body(t, V):
        H = hess_samples[t % hess_samples.shape[0]]
        return grads_q + V - (H @ V) / scale

    return jax.lax.fori_loop(0, max_iter, body, grads_q)


# --------------------------------------------------------------- Arnoldi IF
# Low-rank inverse-Hessian approximation for influence functions
# ("Scaling Up Influence Functions", Schioppa et al., arXiv:2112.03052):
# a Lanczos pass extracts the top eigenpairs of the training Hessian once,
# then every (H + damping)^-1 v solve is a projection — exact on the top
# eigenspace, 1/damping on the orthogonal complement (where the remaining
# eigenvalues are assumed << damping).  An EXTRA beyond the reference's
# second-order set (its solver is per-query Newton-CG, Influence.py:445).
# Memory note: the Lanczos basis is (rank, #params) f32, and forming the
# Ritz vectors transiently holds ~2x that (basis list + stacked rotation)
# — on 16 GB chips keep rank <= 8 for the 55M-param PW1 (~3.5 GB peak).


def lanczos_eigsh(spec, params, x, y_onehot, rank: int, key,
                  w=None) -> tuple:
    """Top eigenpairs of the batch-CE training Hessian by Lanczos with
    full reorthogonalization; the matvec is the jitted forward-over-
    reverse HVP (``influence.hvp``), so each iteration is one fused
    device program over the whole (optionally zero-weight-padded) batch.

    Returns ``(evals, V, unravel)``: eigenvalues by descending magnitude
    ``(r,)``, Ritz vectors ``(r, dim)`` (rows orthonormal), and the
    flat->pytree unraveler.  ``r <= rank`` (early Lanczos breakdown
    truncates).
    """
    from jax.flatten_util import ravel_pytree

    from nnal_tpu.scoring.influence import hvp

    flat_params, unravel = ravel_pytree(params)
    x = jnp.asarray(x)
    y_onehot = jnp.asarray(y_onehot)

    def matvec(vf):
        Hv = hvp(spec, params, x, y_onehot, unravel(vf), w)
        return ravel_pytree(Hv)[0]

    v = jax.random.normal(key, flat_params.shape, jnp.float32)
    v = v / jnp.linalg.norm(v)
    V = [v]
    alphas, betas = [], []
    for j in range(rank):
        u = matvec(V[j])
        alpha = jnp.dot(u, V[j])
        alphas.append(float(alpha))
        u = u - alpha * V[j]
        if j > 0:
            u = u - betas[j - 1] * V[j - 1]
        # full reorthogonalization (twice is enough): float drift makes
        # plain three-term Lanczos lose orthogonality within ~10 steps
        for _ in range(2):
            for q in V:
                u = u - jnp.dot(u, q) * q
        beta = float(jnp.linalg.norm(u))
        if j == rank - 1:
            break
        if beta < 1e-7:          # invariant subspace found: breakdown
            break
        betas.append(beta)
        V.append(u / beta)

    r = len(alphas)
    T = (np.diag(np.asarray(alphas))
         + np.diag(np.asarray(betas[:r - 1]), 1)
         + np.diag(np.asarray(betas[:r - 1]), -1))
    evals, U = np.linalg.eigh(T)              # (r,), (r, r): tiny, host
    # order by |eigenvalue|: the CE Hessian is indefinite, and for the
    # damped inverse the modes FARTHEST from zero (either sign) are the
    # ones the complement's 1/damping approximation gets most wrong —
    # Lanczos converges to both spectrum ends first, so they are captured
    order = np.argsort(-np.abs(evals))
    evals = evals[order]
    Vmat = jnp.stack(V[:r])                   # (r, dim)
    ritz = jnp.asarray(U[:, order].T) @ Vmat  # (r, dim)
    return jnp.asarray(evals, jnp.float32), ritz, unravel


def arnoldi_s_test(spec, params, train_x, train_y_onehot, query_x,
                   query_y_onehot, rank: int, key, damping: float = 0.01,
                   n_valid=None, q_n_valid=None, bucket: int = 256,
                   basis=None):
    """Low-rank influence ``s_test ~= (H + damping)^{-1} grad L(query)``
    (Schioppa et al., arXiv:2112.03052): exact on the top-``rank``
    eigenspace, ``1/damping`` on the complement.  Same padding contract
    as :func:`influence.s_test` (zero-weight rows are no-ops in both the
    Hessian and the query gradient).  Pass ``basis`` (a previous return's
    ``(evals, V, unravel)``) to reuse the Lanczos basis across queries or
    rounds — the paper's amortization — at the cost of staleness."""
    from jax.flatten_util import ravel_pytree

    from nnal_tpu.scoring.influence import loss_grad, weighted_loss_grad

    if basis is None:
        # the training set is only needed to BUILD the basis — a reused
        # basis skips the padded upload entirely
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
        evals, V, unravel = lanczos_eigsh(spec, params, tx, ty, rank, key,
                                          w=w)
    else:
        evals, V, unravel = basis

    qx = jnp.asarray(query_x)
    qy = jnp.asarray(query_y_onehot)
    if q_n_valid is not None:
        qw = jnp.asarray(np.arange(qx.shape[0]) < int(q_n_valid),
                         jnp.float32)
        g = weighted_loss_grad(spec, params, qx, qy, qw)
    else:
        g = loss_grad(spec, params, qx, qy)
    gf, _ = ravel_pytree(g)

    proj = V @ gf                                       # (r,)
    # the CE Hessian is indefinite and the basis holds the extreme
    # NEGATIVE modes too: an eigenvalue near -damping would make
    # 1/(lam + damping) blow up (inf at exactly -damping) and one mode
    # would own the whole solve — annihilate near-singular directions
    # instead (relative floor at 10% of damping)
    denom = evals + damping
    inv = jnp.where(jnp.abs(denom) < 0.1 * damping, 0.0, 1.0 / denom)
    top = V.T @ (proj * inv)
    compl = (gf - V.T @ proj) / damping
    return unravel(top + compl), (evals, V, unravel)
