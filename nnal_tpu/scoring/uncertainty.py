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
import numpy as np

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


_BUCKET = 1024


def _pad_bucket(x, fill: float) -> jnp.ndarray:
    """Pad a 1-D score vector to a bucket multiple so the selection kernels
    compile once per bucket, not once per AL round: the pool shrinks by k
    every round, and each new length would otherwise recompile top_k/gather
    on the (seconds-per-program) remote TPU compiler.  Host arrays are
    padded with numpy (an eager device concatenate would itself compile
    per input length)."""
    pad = -x.shape[0] % _BUCKET
    if pad == 0:
        return jnp.asarray(x)
    if isinstance(x, np.ndarray):
        return jnp.asarray(np.concatenate(
            [x, np.full((pad,), fill, x.dtype)]))
    return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])


@jax.jit
def _mask_tail(scores: jnp.ndarray, n, fill) -> jnp.ndarray:
    """Overwrite rows >= n (the bucket padding) with ``fill``; ``n`` is
    traced, so one compile covers every pool size within a bucket."""
    return jnp.where(jnp.arange(scores.shape[0]) < n, scores, fill)


def uncertainty_filter(posteriors, B: int):
    """Indices of the B highest-entropy rows (reference
    ``uncertainty_filtering``, NNAL_tools.py:22)."""
    P = posteriors
    n = P.shape[0]
    B = min(B, n)
    pad = -n % _BUCKET
    if pad:
        if isinstance(P, np.ndarray):
            P = np.concatenate([P, np.zeros((pad, P.shape[-1]), P.dtype)])
        else:
            P = jnp.concatenate([P, jnp.zeros((pad, P.shape[-1]),
                                              P.dtype)])
    ent = _mask_tail(shannon_entropy(jnp.asarray(P)), jnp.asarray(n),
                     -jnp.inf)
    _, idx = jax.lax.top_k(ent, B)
    return idx


def binary_uncertainty_filter(p1, B: int):
    """Indices of the B smallest ``|p-0.5|`` (reference PW_NNAL.py:668-679).

    Implemented as ``top_k(-score)`` so it stays on device; ties broken by
    index order (stable), the documented tie-break for rank parity.
    """
    n = p1.shape[0]
    B = min(B, n)
    scores = binary_uncertainty_scores(_pad_bucket(p1, 0.5))
    # padded rows score +inf: strictly worse than any real row
    scores = _mask_tail(scores, jnp.asarray(n), jnp.inf)
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


def bald_scores_bucketed(mc_p1) -> np.ndarray:
    """BALD/QBC scores for a host ``(T, n)`` MC/committee stack through a
    bucket-padded device kernel — one program per (T, bucket) instead of
    one per pool size (the pool shrinks by k every AL round; the repo's
    shape-stability standing rule).  Padding columns are p=0.5, whose BALD
    score is exactly 0 (the minimum), and only the leading n scores are
    returned, so rankings are bit-identical to the unpadded call."""
    mc = np.asarray(mc_p1)
    T, n = mc.shape
    pad = -n % _BUCKET
    if pad:
        mc = np.concatenate([mc, np.full((T, pad), 0.5, mc.dtype)],
                            axis=1)
    return np.asarray(bald_from_mc(jnp.asarray(mc)))[:n]


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
