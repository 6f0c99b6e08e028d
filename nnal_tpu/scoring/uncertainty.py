"""Uncertainty scores: entropy, binary margin, MC-dropout aggregates, BALD.

These are the closed forms the reference computes in NumPy on host
(NNAL_tools.py:71 entropy; PW_NNAL.py:51-87 binary margins; PW_NNAL.py:250-282
BALD; PW_NNAL.py:492-545 QBC-JS).  Here they are jitted device kernels meant
to fuse into the tail of the posterior sweep, so pool scores never leave HBM
until the final top-k.

Convention: posteriors are row-major ``(n, c)``; binary shortcuts take
``p1 = P[:, 1]``.  "Most uncertain" = smallest ``|p1 - 0.5|`` (binary) or
largest entropy (multi-class), matching the reference's sort directions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS_ENT = 1e-8   # reference guards p==0 with +=1e-8 (NNAL_tools.py:80)
_EPS_BALD = 1e-6  # reference BALD guard (PW_NNAL.py:264-268)


@jax.jit
def shannon_entropy(posteriors: jnp.ndarray) -> jnp.ndarray:
    """Row-wise Shannon entropy of ``(n, c)`` posteriors."""
    p = jnp.where(posteriors == 0, _EPS_ENT, posteriors)
    return -jnp.sum(p * jnp.log(p), axis=-1)


@jax.jit
def binary_uncertainty_scores(p1: jnp.ndarray) -> jnp.ndarray:
    """``|p - 0.5|`` — ascending sort gives most-uncertain-first."""
    return jnp.abs(p1 - 0.5)


def uncertainty_filter(posteriors, B: int):
    """Indices of the B highest-entropy rows (reference
    ``uncertainty_filtering``, NNAL_tools.py:22)."""
    ent = shannon_entropy(jnp.asarray(posteriors))
    B = min(B, ent.shape[0])
    _, idx = jax.lax.top_k(ent, B)
    return idx


def binary_uncertainty_filter(p1, B: int):
    """Indices of the B smallest ``|p-0.5|`` (reference PW_NNAL.py:668-679).

    Implemented as ``top_k(-score)`` so it stays on device; ties broken by
    index order (stable), the documented tie-break for rank parity.
    """
    scores = binary_uncertainty_scores(jnp.asarray(p1))
    B = min(B, scores.shape[0])
    _, idx = jax.lax.top_k(-scores, B)
    return idx


@jax.jit
def binary_entropy(p1: jnp.ndarray) -> jnp.ndarray:
    p = jnp.clip(p1, _EPS_BALD, None)
    q = jnp.clip(1.0 - p1, _EPS_BALD, None)
    return -p1 * jnp.log(p) - (1.0 - p1) * jnp.log(q)


@jax.jit
def bald_from_mc(mc_p1: jnp.ndarray) -> jnp.ndarray:
    """BALD mutual information from MC-dropout binary posteriors
    ``(T, n)``: ``H(mean_t p) - mean_t H(p)`` (reference PW_NNAL.py:250-282).
    Descending sort gives most-informative-first."""
    av = jnp.mean(mc_p1, axis=0)
    av_ent = jnp.mean(binary_entropy(mc_p1), axis=0)
    return binary_entropy(av) - av_ent


@jax.jit
def qbc_js_scores(committee_p1: jnp.ndarray) -> jnp.ndarray:
    """Query-by-committee Jensen-Shannon-style disagreement over an ensemble's
    binary posteriors ``(E, n)`` (reference PW_NNAL.py:492-545) — identical
    decomposition to BALD but across committee members."""
    return bald_from_mc(committee_p1)


@jax.jit
def multiclass_bald_from_mc(mc_posts: jnp.ndarray) -> jnp.ndarray:
    """General BALD over ``(T, n, c)`` MC posteriors."""
    av = jnp.mean(mc_posts, axis=0)
    av_ent = jnp.mean(shannon_entropy(mc_posts.reshape(-1, mc_posts.shape[-1]))
                      .reshape(mc_posts.shape[:2]), axis=0)
    return shannon_entropy(av) - av_ent


def running_average(new, avg, i: int):
    """Numerically-faithful running mean ``(new + i*avg) / (i+1)`` — the
    reference's exact MC accumulation (PW_NNAL.py:82), preserved so MC-method
    ranks match the oracle bit-for-rank."""
    return (new + i * avg) / (i + 1)
