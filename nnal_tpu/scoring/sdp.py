"""Fisher-information query-distribution solver.

The reference solves, with CVXOPT/MOSEK on host (NNAL_tools.py:576-720),

    min_{q, t}  sum_j t_j   s.t.  [[I(q), e_j], [e_j^T, t_j]] >= 0 (PSD),
                q in simplex,  I(q) = sum_i q_i A_i,

which by Schur complement is exactly A-optimal experiment design:

    min_q  tr( I(q)^{-1} )   over the simplex,

with optional extras: a peak cap ``q_i <= 1/k`` (inequality_cvx_matrix's k
branch) and, for ``lambda_ > 0``, a representativeness term
``- lambda * ||x_i||^2 q_i`` with the zero-mean feature equality
``F q = 0`` (SDP_query_distribution, NNAL_tools.py:613-655).

Neither CVXOPT nor CVXPY exists in this environment, and a general-purpose
interior-point SDP would waste the structure anyway.  Because d (=#layers
after 'sum' gradient shrinkage, ~7-9) is tiny and n=B is a few hundred, the
whole problem is solved **on device** with a jitted Frank-Wolfe loop over the
capped simplex: per-iteration cost is one d x d Cholesky + one
``einsum('ab,nab->n')`` — MXU/VPU work, no host round-trips.  The
feature-equality constraint is handled by quadratic penalty.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _trinv(M: jnp.ndarray) -> jnp.ndarray:
    """tr(M^{-1}) via Cholesky (M is PSD by diagonal loading)."""
    L = jnp.linalg.cholesky(M)
    Linv = jax.scipy.linalg.solve_triangular(L, jnp.eye(M.shape[0]),
                                             lower=True)
    return jnp.sum(Linv ** 2)


def _grad_trinv(A: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """d/dq_i tr(M(q)^{-1}) = -tr(M^{-1} A_i M^{-1})."""
    M = jnp.einsum("n,nab->ab", q, A)
    Minv = jnp.linalg.inv(M)
    G = Minv @ Minv
    return -jnp.einsum("ab,nab->n", G, A)


def _lmo_capped_simplex(grad: jnp.ndarray, cap: float) -> jnp.ndarray:
    """Linear minimization oracle over {q: sum q = 1, 0 <= q <= cap}:
    fill the lowest-gradient coordinates up to ``cap`` each."""
    n = grad.shape[0]
    order = jnp.argsort(grad)
    ranks = jnp.argsort(order)            # rank of each coord by gradient
    full = jnp.floor(1.0 / cap).astype(jnp.int32)
    frac = 1.0 - full * cap
    s = jnp.where(ranks < full, cap,
                  jnp.where(ranks == full, frac, 0.0))
    return s.astype(grad.dtype)


@partial(jax.jit, static_argnames=("steps", "rho", "cap"))
def solve_a_optimal(A: jnp.ndarray, cap: float = 1.0,
                    lin: Optional[jnp.ndarray] = None,
                    F: Optional[jnp.ndarray] = None,
                    rho: float = 0.0, steps: int = 400) -> jnp.ndarray:
    """Frank-Wolfe for  min_q tr(M(q)^{-1}) + lin.q + rho/2 ||F q||^2  over
    the capped simplex.  ``A``: (n, d, d) stack of per-sample conditional
    Fisher matrices (diagonally loaded upstream)."""
    n = A.shape[0]
    q0 = jnp.full((n,), 1.0 / n, A.dtype)
    lin_t = jnp.zeros((n,), A.dtype) if lin is None else lin
    FtF = None if (F is None or rho == 0.0) else (F.T @ F) * rho

    def body(t, q):
        g = _grad_trinv(A, q) + lin_t
        if FtF is not None:
            g = g + FtF @ q
        s = _lmo_capped_simplex(g, cap)
        gamma = 2.0 / (t + 2.0)
        return (1.0 - gamma) * q + gamma * s

    return jax.lax.fori_loop(0, steps, body, q0)


def fi_query_distribution(A, lambda_: float = 0.0, X_pool=None, k=None,
                          cap_peak: bool = False, steps: int = 400,
                          rho: float = 10.0) -> np.ndarray:
    """Drop-in equivalent of the reference ``SDP_query_distribution``
    (NNAL_tools.py:613) returning the optimal query PMF as a NumPy vector.

    ``A``: list/stack of (d, d) conditional-FI matrices.
    ``lambda_ > 0`` activates the representativeness objective with
    zero-mean features ``X_pool`` (d_feat, n) (reference equality
    ``F q = 0`` becomes a quadratic penalty with weight ``rho``).
    ``cap_peak`` applies the anti-degenerate cap ``q_i <= 1/k``.
    """
    A = jnp.asarray(np.stack([np.asarray(a) for a in A]), jnp.float32)
    n = A.shape[0]
    cap = (1.0 / k) if (cap_peak and k) else 1.0
    lin = None
    F = None
    use_rho = 0.0
    if lambda_ > 0 and X_pool is not None and np.size(X_pool) > 0:
        Xp = jnp.asarray(np.asarray(X_pool), jnp.float32)
        lin = -lambda_ * jnp.sum(Xp ** 2, axis=0)
        F = Xp
        use_rho = rho
    q = solve_a_optimal(A, cap=cap, lin=lin, F=F, rho=use_rho, steps=steps)
    q = np.asarray(q, dtype=np.float64)
    q[q < 0] = 0.0
    s = q.sum()
    return q / s if s > 0 else np.full(n, 1.0 / n)


def trace_inverse(q, A) -> float:
    """Objective value tr(M(q)^{-1}) — exposed for tests."""
    M = np.einsum("n,nab->ab", np.asarray(q), np.asarray(A))
    return float(np.trace(np.linalg.inv(M)))
