"""Conditional Fisher-information A-matrices + the FI query pipeline.

Reference flow (PW_NNAL.py:89-163 single subject; 547-627 multi-subject):
uncertainty-filter the pool to B -> per-sample per-class gradients, 'sum'
shrinkage -> ``A_i = (1-p) g0 g0^T + p g1 g1^T + load*I`` -> SDP -> sample
queries from the optimal PMF.  Here the whole scoring stage is one batched
device program (see scoring.gradients for the epsilon trick), the SDP is the
jitted A-optimal solver (scoring.sdp), and only the k sampled indices return
to host.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.scoring.gradients import shrunk_class_grads
from nnal_tpu.scoring.pmf import sample_query_pmf
from nnal_tpu.scoring.sdp import fi_query_distribution


@jax.jit
def a_matrices(shrunk: jnp.ndarray, posts_p1: jnp.ndarray,
               diag_load: float = 1e-5) -> jnp.ndarray:
    """Batched binary conditional-FI matrices (reference ``gen_A_matrices``,
    PW_NNAL.py:736-816).

    ``shrunk``: (b, 2, L) 'sum'-shrunk class-gradients; ``posts_p1``: (b,)
    P(y=1|x).  Posteriors are snapped to exactly 0/1 beyond 1e-6 (and the
    opposite class gradient dropped), matching the reference's branches.
    """
    p = posts_p1
    p = jnp.where(p < 1e-6, 0.0, p)
    p = jnp.where(p > 1 - 1e-6, 1.0, p)
    g0 = jnp.where((p == 1.0)[:, None], 0.0, shrunk[:, 0, :])
    g1 = jnp.where((p == 0.0)[:, None], 0.0, shrunk[:, 1, :])
    A = ((1.0 - p)[:, None, None] * g0[:, :, None] * g0[:, None, :]
         + p[:, None, None] * g1[:, :, None] * g1[:, None, :])
    L = shrunk.shape[-1]
    return A + diag_load * jnp.eye(L)


@jax.jit
def a_matrices_multiclass(shrunk: jnp.ndarray, posts: jnp.ndarray,
                          diag_load: float = 1e-5) -> jnp.ndarray:
    """Multi-class conditional FI (reference NNAL.py:334-414): per-class
    outer products weighted by the posterior,
    ``A_i = sum_c p_c g_c g_c^T`` on shrunk gradients."""
    A = jnp.einsum("bc,bcl,bcm->blm", posts, shrunk, shrunk)
    L = shrunk.shape[-1]
    return A + diag_load * jnp.eye(L)


@jax.jit
def hallucinated_class_grads(F: jnp.ndarray, posts: jnp.ndarray
                             ) -> jnp.ndarray:
    """Hallucinated last-layer class-gradients over probe features — the
    BADGE construction (Ash et al., ICLR 2020) shaped for the reference's
    A-matrix pipeline.  Dense (FCN) specs have no per-patch full-network
    gradient, so fi uses the Fisher of a surrogate softmax layer
    ``z = W^T [f; 1]`` over the model's own per-pixel probe features:
    the CE gradient at ASSUMED label c is ``(p_j - delta_jc) (x) [f; 1]``
    flattened over output classes j.

    ``F``: (b, d) features; ``posts``: (b,) P(y=1) for binary or (b, c).
    Returns (b, c, c*(d+1)) — feed to :func:`a_matrices` (binary) /
    :func:`a_matrices_multiclass`."""
    if posts.ndim == 1:
        posts = jnp.stack([1.0 - posts, posts], axis=1)
    b, d = F.shape
    c = posts.shape[1]
    f1 = jnp.concatenate([F, jnp.ones((b, 1), F.dtype)], axis=1)
    delta = jnp.eye(c, dtype=F.dtype)
    coeff = posts[:, None, :] - delta[None, :, :]     # (b, assumed, j)
    g = coeff[..., None] * f1[:, None, None, :]       # (b, assumed, j, d+1)
    return g.reshape(b, c, c * (d + 1))


def refine_feature_matrix(F: np.ndarray, B: int,
                          cond_limit: float = 1e6) -> np.ndarray:
    """Select a well-conditioned full-row-rank feature submatrix (reference
    ``refine_feature_matrix``, PW_NNAL.py:819-849): keep the B/2 features
    with the most nonzeros, then drop rows until full rank and cond < 1e6."""
    F = np.asarray(F)
    nnz = np.sum(F > 0, axis=1)
    feat_inds = np.argsort(-nnz)[:max(1, int(B / 2))]
    ref = F[feat_inds, :]
    while len(feat_inds) > 1 and np.linalg.matrix_rank(ref) < len(feat_inds):
        feat_inds = feat_inds[:-1]
        ref = F[feat_inds, :]
    while len(feat_inds) > 1 and np.linalg.cond(ref) > cond_limit:
        feat_inds = feat_inds[:-1]
        ref = F[feat_inds, :]
    return ref


def fi_select(spec, params, patches, posts_p1, k: int, rng, *,
              lambda_: float = 0.0, features: Optional[np.ndarray] = None,
              diag_load: float = 1e-5, cap_peak: bool = False,
              sdp_steps: int = 2000) -> np.ndarray:
    """End-to-end FI querying over a filtered candidate set.

    ``patches``: (B, ...) normalized candidate patches, ``posts_p1``: their
    binary posteriors.  Returns positions (into the candidate set) of the
    sampled queries.
    """
    from nnal_tpu.core.profiling import subphase

    with subphase("fi/grads_A"):
        shrunk = shrunk_class_grads(spec, params, jnp.asarray(patches))
        A = np.asarray(a_matrices(
            shrunk, jnp.asarray(np.asarray(posts_p1, np.float32)),
            diag_load))
    X_pool = None
    if lambda_ > 0 and features is not None:
        B = patches.shape[0]
        ref_F = refine_feature_matrix(np.asarray(features).T, B)
        ref_F = ref_F - ref_F.mean(axis=1, keepdims=True)
        X_pool = ref_F
    with subphase("fi/sdp"):
        q = fi_query_distribution(A, lambda_, X_pool, k,
                                  cap_peak=cap_peak, steps=sdp_steps)
    with subphase("fi/pmf"):
        return sample_query_pmf(q, k, rng, replacement=True)
