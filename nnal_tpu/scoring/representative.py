"""Representativeness / diversity selection: rep-entropy and core-set.

Reference mechanisms:
* rep-entropy (NNAL.py:466-523, PW_NNAL.py:284-351): uncertainty-filter to B
  candidates, then greedily add the candidate maximizing
  ``sum_pool max_{q in Q} cos_sim(pool, q)``;
* core-set (PW_NNAL.py:353-451): greedy k-center — track per-pool-sample max
  similarity to the labeled set, repeatedly query the argmin, update with the
  new query's similarity row (the reference streams features in 1000-chunks
  and caches ``UT_sims.txt``).

TPU-native shape: cosine-similarity tiles and the greedy updates are jitted
device kernels (``lax.fori_loop`` over k inside one program), so the n x B
similarity matrix never leaves HBM; the reference's 5000-chunk host tiling
(PW_NNAL.py:1041-1136) becomes device-side tiling only when n is huge.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# leading-dim bucket for the heavy jitted kernels (similarity matmuls,
# greedy-select fori loops): the pool shrinks by k and the labeled set
# grows by k every AL round, so un-padded shapes recompiled those
# programs per round on the remote compiler (the repo's shape-stability
# standing rule).  4096 rows of 4096-d f32 features = 64 MB per bucket
# increment — cheap against 16 GB HBM.
ROW_BUCKET = 4096


def pad_rows(F, mult: int = ROW_BUCKET, fill: float = 0.0):
    """Pad the leading dim to a multiple of ``mult`` (device concat — the
    one cheap program allowed to recompile per round; the heavy kernels
    downstream then see bucket-stable shapes).  Returns ``(padded, n)``.

    Fill choice is the caller's rank-neutrality argument: zero rows
    normalize to zero similarity (a constant shift in rep-entropy scores,
    and sliced-off rows in max-reductions)."""
    F = jnp.asarray(F)
    n = F.shape[0]
    pad = -n % mult
    if pad == 0:
        return F, n
    return jnp.concatenate(
        [F, jnp.full((pad,) + F.shape[1:], fill, F.dtype)]), n


def pad_inds_repeat(inds, mult: int) -> np.ndarray:
    """Pad a HOST index array to a multiple of ``mult`` by repeating its
    first entry — the device gather over it then compiles once per
    bucket, and the duplicate rows it produces are exact no-ops wherever
    a max-reduction consumes them (or are masked/sliced by the caller)."""
    inds = np.asarray(inds)
    pad = -len(inds) % mult
    if pad == 0:
        return inds
    return np.concatenate([inds, np.full(pad, inds[0], inds.dtype)])


def pad_rows_repeat(F, mult: int = ROW_BUCKET):
    """Pad the leading dim to a multiple of ``mult`` by repeating row 0 —
    duplicates never change a max-reduction over rows, so this is the
    exact pad for the *reduced-over* side of cross-max similarities."""
    F = jnp.asarray(F)
    pad = -F.shape[0] % mult
    if pad == 0:
        return F
    return jnp.concatenate(
        [F, jnp.broadcast_to(F[:1], (pad,) + F.shape[1:])])


@jax.jit
def cosine_similarity(F1: jnp.ndarray, F2: jnp.ndarray) -> jnp.ndarray:
    """(n1, n2) cosine similarities; features are rows.  Zero rows (a
    post-ReLU feature vector can be exactly zero for background patches
    under a one-class-regime model) normalize to zero instead of NaN —
    NaN comparisons are false on XLA, which silently corrupts every
    downstream greedy argmax/argmin selection."""
    n1 = F1 / jnp.maximum(jnp.linalg.norm(F1, axis=1, keepdims=True), 1e-12)
    n2 = F2 / jnp.maximum(jnp.linalg.norm(F2, axis=1, keepdims=True), 1e-12)
    return jnp.dot(n1, n2.T, preferred_element_type=jnp.float32)


def self_max_similarities(F: jnp.ndarray, tile: int = 4096) -> np.ndarray:
    """Per-sample max cosine similarity to the *rest* of the set (reference
    ``get_self_sims``, PW_NNAL.py:1041-1103), tiled to bound memory."""
    F = jnp.asarray(F)
    n = F.shape[0]
    out = []
    for lo in range(0, n, tile):
        sims = cosine_similarity(F[lo:lo + tile], F)
        cols = jnp.arange(lo, min(lo + tile, n))
        rows = jnp.arange(sims.shape[0])
        sims = sims.at[rows, cols].set(-jnp.inf)
        out.append(np.asarray(jnp.max(sims, axis=1)))
    return np.concatenate(out)


def cross_max_similarities(F1, F2, tile: int = 4096,
                           as_device: bool = False,
                           keep_pad: bool = False) -> np.ndarray:
    """Per-row-of-F1 max similarity to F2 (reference ``get_cross_sims``,
    PW_NNAL.py:1105-1136).  On TPU with large pools, routes through the
    Pallas VMEM-resident row-max kernel; XLA tiling otherwise.
    ``as_device`` keeps the result on device (the core-set flow never
    leaves HBM).

    Bucket-stable: F1 (the pool side) is zero-padded to a ``tile``
    multiple (zero rows yield similarity 0 and are sliced off) and F2
    (the reduced-over labeled side) is padded by repeating row 0 (a
    duplicate never changes a max) — so the heavy matmul compiles once
    per bucket instead of once per AL round.  With ``keep_pad`` the
    result length is F1's length rounded up to a ``tile`` multiple —
    callers who pre-pad F1 must use the same ``tile``."""
    import jax

    F1, n1 = pad_rows(F1, tile)
    F2 = pad_rows_repeat(F2, min(ROW_BUCKET, 256))
    if (jax.devices()[0].platform == "tpu"
            and F1.shape[0] * F2.shape[0] > 1 << 22):
        from nnal_tpu.ops.similarity_pallas import max_similarity

        sims = max_similarity(F1, F2, use_pallas=True)
        sims = sims if keep_pad else sims[:n1]
        return sims if as_device else np.asarray(sims)
    out = []
    for lo in range(0, F1.shape[0], tile):
        sims = cosine_similarity(F1[lo:lo + tile], F2)
        out.append(jnp.max(sims, axis=1))
    cat = jnp.concatenate(out)
    cat = cat if keep_pad else cat[:n1]
    return cat if as_device else np.asarray(cat)


def rep_entropy_from_features(F, rest, sel, k: int) -> np.ndarray:
    """Bucket-stable rep-entropy selection from a feature matrix:
    gathers ``F[rest]`` zero-masked-padded to a ROW_BUCKET multiple (a
    zero row adds the same max(best, 0) to every candidate's score —
    rank-neutral) and runs the greedy select on stable shapes.
    ``rest``/``sel`` are host index arrays; returns positions into
    ``sel``.  A NumPy ``F`` is gathered on host (zero device compiles);
    a device ``F`` via a bucket-stable gather + mask."""
    rest = np.asarray(rest)
    rest_p = pad_inds_repeat(rest, ROW_BUCKET)
    valid = (np.arange(len(rest_p)) < len(rest)).astype(np.float32)
    if isinstance(F, np.ndarray):
        F_rest = jnp.asarray(F[rest_p] * valid[:, None])
        F_sel = jnp.asarray(F[np.asarray(sel)])
    else:
        F_rest = F[jnp.asarray(rest_p)] * jnp.asarray(valid)[:, None]
        F_sel = F[jnp.asarray(sel)]
    sims = cosine_similarity(F_rest, F_sel)
    return np.asarray(rep_entropy_select(sims, k))


@partial(jax.jit, static_argnames=("k",))
def rep_entropy_select(sims: jnp.ndarray, k: int) -> jnp.ndarray:
    """Greedy max-representativeness over candidate columns.

    ``sims``: (n_rest, B) similarities between the non-candidate pool and the
    B uncertain candidates.  Iteratively add the candidate maximizing
    ``sum_pool max(best_so_far, sims[:, j])`` (reference greedy,
    PW_NNAL.py:330-349).  Returns k candidate positions.
    """
    B = sims.shape[1]

    def body(i, carry):
        best, chosen_mask, chosen = carry
        # score for each candidate j: sum of elementwise max with current best
        cand_scores = jnp.sum(jnp.maximum(best[:, None], sims), axis=0)
        cand_scores = jnp.where(chosen_mask, -jnp.inf, cand_scores)
        j = jnp.argmax(cand_scores)
        best = jnp.maximum(best, sims[:, j])
        chosen_mask = chosen_mask.at[j].set(True)
        chosen = chosen.at[i].set(j)
        return best, chosen_mask, chosen

    init = (jnp.full((sims.shape[0],), -jnp.inf, sims.dtype),
            jnp.zeros((B,), bool), jnp.zeros((k,), jnp.int32))
    _, _, chosen = jax.lax.fori_loop(0, k, body, init)
    return chosen


@partial(jax.jit, static_argnames=("k",))
def core_set_select(Fu_normed: jnp.ndarray, sims0: jnp.ndarray,
                    k: int) -> jnp.ndarray:
    """Greedy k-center on cosine similarity (reference PW_NNAL.py:416-447).

    ``Fu_normed``: (n, d) L2-normalized pool features; ``sims0``: (n,) max
    similarity of each pool sample to the labeled set (-inf if none).
    Each step queries ``argmin(sims)``, then raises sims with the query's
    similarity row and marks the query with +inf.
    """
    def body(i, carry):
        sims, chosen = carry
        q = jnp.argmin(sims)
        s_row = jnp.dot(Fu_normed, Fu_normed[q],
                        preferred_element_type=jnp.float32)
        sims = jnp.maximum(sims, s_row)
        sims = sims.at[q].set(jnp.inf)
        chosen = chosen.at[i].set(q)
        return sims, chosen

    init = (sims0, jnp.zeros((k,), jnp.int32))
    _, chosen = jax.lax.fori_loop(0, k, body, init)
    return chosen


def normalize_rows(F) -> jnp.ndarray:
    F = jnp.asarray(F)
    # zero rows -> zero, not NaN (see cosine_similarity)
    return F / jnp.maximum(jnp.linalg.norm(F, axis=1, keepdims=True), 1e-12)


# --------------------------------------------------------------------- BADGE
# TPU-native EXTRA beyond the reference's strategy set (Ash et al.,
# "Deep Batch Active Learning by Diverse, Uncertain Gradient Lower
# Bounds", ICLR 2020): k-means++ sampling over hallucinated last-layer
# gradient embeddings.  The embedding norm carries uncertainty
# (1 - max-class confidence) and the k-means++ spread carries batch
# diversity — a batch-aware complement to the reference's point-wise
# uncertainty strategies.

@jax.jit
def badge_embeddings_multiclass(H: jnp.ndarray, P: jnp.ndarray
                                ) -> jnp.ndarray:
    """(n, C*d) BADGE embeddings from features ``H`` (n, d) and posteriors
    ``P`` (n, C): ``g_i = (p_i - onehot(argmax p_i)) (x) h_i`` — the exact
    last-layer weight gradient of CE at the hallucinated label."""
    P = P.astype(jnp.float32)
    yhat = jnp.argmax(P, axis=1)
    c = P - jax.nn.one_hot(yhat, P.shape[1], dtype=P.dtype)
    H = H.astype(jnp.float32)
    return (c[:, :, None] * H[:, None, :]).reshape(H.shape[0], -1)


@jax.jit
def badge_embeddings(H: jnp.ndarray, p1: jnp.ndarray) -> jnp.ndarray:
    """Binary-head shortcut: (n, 2d) embeddings from positive-class
    posteriors ``p1`` (n,) (see
    :func:`badge_embeddings_multiclass`)."""
    p1 = p1.astype(jnp.float32)
    return badge_embeddings_multiclass(
        H, jnp.stack([1.0 - p1, p1], axis=1))


@partial(jax.jit, static_argnames=("k",))
def badge_kmeanspp(E: jnp.ndarray, k: int, key) -> jnp.ndarray:
    """k-means++ seeding over embedding rows: first center uniform, each
    next sampled with probability proportional to its squared distance to
    the chosen set.  Whole loop is one device program (``fori_loop``);
    chosen rows get distance 0 so they cannot be re-drawn, and an
    all-duplicates corner falls back to the first unchosen index."""
    n = E.shape[0]
    sq = jnp.sum(E * E, axis=1)
    first = jax.random.randint(key, (), 0, n)
    d2 = jnp.maximum(sq + sq[first] - 2.0 * (E @ E[first]), 0.0)
    mind2 = d2.at[first].set(0.0)
    taken = jnp.zeros((n,), bool).at[first].set(True)
    chosen = jnp.zeros((k,), jnp.int32).at[0].set(first.astype(jnp.int32))

    def body(i, carry):
        mind2, taken, chosen = carry
        avail = ~taken
        ok = avail & (mind2 > 0.0)
        logits = jnp.where(ok, jnp.log(jnp.maximum(mind2, 1e-30)),
                           -jnp.inf)
        drawn = jax.random.categorical(jax.random.fold_in(key, i), logits)
        # all remaining candidates coincide with chosen ones -> take the
        # first unchosen deterministically instead of a degenerate draw
        nxt = jnp.where(jnp.any(ok), drawn,
                        jnp.argmax(avail)).astype(jnp.int32)
        d2 = jnp.maximum(sq + sq[nxt] - 2.0 * (E @ E[nxt]), 0.0)
        mind2 = jnp.minimum(mind2, d2).at[nxt].set(0.0)
        taken = taken.at[nxt].set(True)
        chosen = chosen.at[i].set(nxt)
        return mind2, taken, chosen

    _, _, chosen = jax.lax.fori_loop(1, k, body, (mind2, taken, chosen))
    return chosen
