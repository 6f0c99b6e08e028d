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
