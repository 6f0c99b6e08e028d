"""Query-strategy dispatch for patch-wise active learning.

Rebuild of ``PW_NNAL.CNN_query`` (PW_NNAL.py:18-166) and the multi-subject
``query_multimg`` (PW_NNAL.py:169-627).  Each strategy consumes a
:class:`QueryContext` (pool evaluator + model + pool indices) and returns
positions into the pool index array.  All heavy math runs in jitted device
programs; only final selections come back to host.

Strategies (reference §2.3 inventory): random, ps-random, entropy,
MC-entropy, BALD, rep-entropy, core-set, ensemble, QBC-JS, fi, SuPix,
influence, AU_4U — plus two TPU-native extras beyond the reference's set:
BADGE (gradient-embedding k-means++, Ash et al. ICLR 2020) and BatchBALD
(greedy joint mutual information, Kirsch et al. NeurIPS 2019).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.data.indexing import global2local_inds
from nnal_tpu.data.patches import gather_patches_normalized
from nnal_tpu.data.samplers import high_variance_filter
from nnal_tpu.scoring.fisher import fi_select
from nnal_tpu.scoring.pool_eval import (
    PoolEvaluator,
    mc_average_posteriors,
    mc_stack_posteriors,
)
from nnal_tpu.scoring.representative import (
    core_set_select,
    cosine_similarity,
    cross_max_similarities,
    normalize_rows,
    rep_entropy_select,
)
from nnal_tpu.scoring.uncertainty import (
    bald_scores_bucketed,
    binary_uncertainty_filter,
)

# rng fold constants — far outside the 0..MC_iters-1 fold range the
# MC-dropout passes use on the same base key, so these streams can never
# alias a dropout pass's key chain (CLAUDE.md rng-fold discipline); one
# home each, imported by the classification dispatch too
_BB_CFG_FOLD = (1 << 20) + 13        # BatchBALD configuration sampling
_ARNOLDI_KEY_FOLD = (1 << 20) + 29   # Lanczos start vector


@dataclass
class QueryContext:
    """Everything a strategy needs for one subject."""

    spec: object
    params: Dict
    evaluator: PoolEvaluator
    pool_inds: np.ndarray                 # raveled voxel indices
    k: int
    rng: np.random.Generator              # host sampling
    jax_rng: jax.Array                    # device stochastic passes
    B: int = 200
    MC_iters: int = 10
    lambda_: float = 0.0
    diag_load: float = 1e-5
    hv_threshold: float = 2.0
    train_inds: Optional[np.ndarray] = None
    labeled_evaluator: Optional[PoolEvaluator] = None
    ensemble_params: Optional[List[Dict]] = None   # for ensemble/QBC-JS
    raw_volume: Optional[np.ndarray] = None        # unpadded modality-0
    extra: Dict = field(default_factory=dict)


_STRATEGIES: Dict[str, Callable] = {}


def register_strategy(name: str):
    def deco(fn):
        _STRATEGIES[name] = fn
        return fn
    return deco


def cnn_query(ctx: QueryContext, method_name: str) -> np.ndarray:
    """Dispatch (reference ``PW_NNAL.CNN_query``).  Returns positions into
    ``ctx.pool_inds``."""
    if method_name not in _STRATEGIES:
        raise ValueError(f"unknown query method {method_name!r}; "
                         f"available: {sorted(_STRATEGIES)}")
    q = _STRATEGIES[method_name](ctx)
    return np.asarray(q, dtype=np.int64)


def _require_patch_evaluator(ev, method: str) -> None:
    """Per-patch gradient methods need the patch evaluator's device
    volumes (``ev.padded``) — dense (FCN) evaluators serve posteriors and
    per-pixel features but have no patch-level loss gradients; fail with
    the same clear message the dense evaluator uses for its missing ops
    instead of an AttributeError mid-strategy."""
    if not hasattr(ev, "padded"):
        raise NotImplementedError(
            f"{method} needs per-patch gradients — dense-model (fcn) "
            "specs support the uncertainty + feature-space families and "
            "last-layer fi; full-gradient methods need the patch-wise "
            "evaluator")


def _posteriors(ctx: QueryContext) -> np.ndarray:
    return ctx.evaluator.evaluate(ctx.params, ctx.pool_inds,
                                  ("posteriors",))["posteriors"]


@register_strategy("random")
def _random(ctx: QueryContext):
    n = len(ctx.pool_inds)
    return ctx.rng.permutation(n)[:ctx.k]


@register_strategy("ps-random")
def _ps_random(ctx: QueryContext):
    """Pseudo-random restricted to high-local-variance voxels (reference
    PW_NNAL.py:37-48)."""
    assert ctx.raw_volume is not None, "ps-random needs the raw volume"
    valid = high_variance_filter(ctx.raw_volume,
                                 ctx.evaluator.patch_shape,
                                 ctx.hv_threshold, ctx.pool_inds)
    pick = ctx.rng.permutation(len(valid))[:ctx.k]
    return valid[pick]


@register_strategy("entropy")
def _entropy(ctx: QueryContext):
    p1 = _posteriors(ctx)
    return np.asarray(binary_uncertainty_filter(p1, ctx.k))


@register_strategy("MC-entropy")
def _mc_entropy(ctx: QueryContext):
    avg = mc_average_posteriors(ctx.evaluator, ctx.params, ctx.pool_inds,
                                ctx.MC_iters, ctx.jax_rng)
    return np.asarray(binary_uncertainty_filter(avg, ctx.k))


@register_strategy("BALD")
def _bald(ctx: QueryContext):
    mc = mc_stack_posteriors(ctx.evaluator, ctx.params, ctx.pool_inds,
                             ctx.MC_iters, ctx.jax_rng)
    scores = bald_scores_bucketed(mc)
    return np.argsort(-scores, kind="stable")[:ctx.k]


@register_strategy("rep-entropy")
def _rep_entropy(ctx: QueryContext):
    """Uncertainty filter to B, then greedy representativeness against the
    remaining pool (reference PW_NNAL.py:284-351).  Features stay on
    device (the (pool, 4096) tensor round-tripping to host dominated
    round latency at production scale)."""
    # bucket-stable end-to-end (shape-stability rule: the pool shrinks by
    # k per round, so unpadded shapes recompiled the evaluate-row gather,
    # the similarity matmul, and the greedy fori every round): the pool
    # index array is repeat-padded BEFORE the device evaluate, so every
    # device program downstream sees one bucket shape; the duplicate rows
    # are excluded on host (p1 slice) and zero-masked in the greedy
    from nnal_tpu.scoring.representative import (
        ROW_BUCKET,
        pad_inds_repeat,
        rep_entropy_from_features,
    )

    n = len(ctx.pool_inds)
    inds_p = pad_inds_repeat(ctx.pool_inds, ROW_BUCKET)
    res = ctx.evaluator.evaluate(ctx.params, inds_p,
                                 ("posteriors", "feature_layer"),
                                 as_device=True)
    p1 = np.asarray(res["posteriors"])[:n]
    F = res["feature_layer"]
    B = min(ctx.B, n)
    sel = np.asarray(binary_uncertainty_filter(p1, B))
    rest = np.setdiff1d(np.arange(n), sel)
    if len(rest) == 0:
        return sel[:ctx.k]
    chosen = rep_entropy_from_features(F, rest, sel, min(ctx.k, B))
    return sel[chosen]


@register_strategy("core-set")
def _core_set(ctx: QueryContext):
    """Greedy k-center on pool features vs labeled features (reference
    PW_NNAL.py:353-451).  Features stay on device end-to-end — with 4096-d
    PW1 features a host round-trip costs GBs per round over the tunnel."""
    # bucket-stable end-to-end (shape-stability rule): the pool index
    # array is repeat-padded BEFORE the device evaluate, so the row
    # gather, the cross-max matmul, and the k-center fori all compile
    # once per bucket.  Padded rows are duplicates of pool row 0; they
    # get sims0=+inf so the argmin can never pick them, and as gather
    # columns they only matter if picked.  The labeled index array is
    # repeat-padded too (a duplicate never changes a max).
    from nnal_tpu.scoring.representative import ROW_BUCKET, pad_inds_repeat

    n_u = len(ctx.pool_inds)
    inds_p = pad_inds_repeat(ctx.pool_inds, ROW_BUCKET)
    F_u = ctx.evaluator.evaluate(ctx.params, inds_p,
                                 ("feature_layer",),
                                 as_device=True)["feature_layer"]
    Fn = normalize_rows(F_u)
    if ctx.train_inds is not None and len(ctx.train_inds) > 0:
        lab_ev = ctx.labeled_evaluator or ctx.evaluator
        tr_p = pad_inds_repeat(ctx.train_inds, 256)
        F_t = lab_ev.evaluate(ctx.params, tr_p,
                              ("feature_layer",),
                              as_device=True)["feature_layer"]
        sims0 = jnp.asarray(cross_max_similarities(F_u, F_t,
                                                   as_device=True,
                                                   keep_pad=True))
    elif ctx.extra.get("bootstrap_features") is not None:
        # labeled-set bootstrap from held-out subjects (reference
        # PW_AL.py:809-822)
        sims0 = jnp.asarray(cross_max_similarities(
            F_u, ctx.extra["bootstrap_features"], as_device=True,
            keep_pad=True))
    else:
        sims0 = jnp.full((F_u.shape[0],), -jnp.inf)
    sims0 = jnp.where(jnp.arange(F_u.shape[0]) < jnp.asarray(n_u),
                      sims0, jnp.inf)
    chosen = np.asarray(core_set_select(Fn, sims0, min(ctx.k, n_u)))
    return chosen


@register_strategy("BADGE")
def _badge(ctx: QueryContext):
    """BADGE batch selection — a TPU-native EXTRA beyond the reference's
    strategy set (Ash et al., ICLR 2020): uncertainty filter to B
    candidates (the fi/rep-entropy composition), then k-means++ sampling
    over hallucinated last-layer gradient embeddings — uncertain (large
    embedding norm) AND mutually diverse batches.  Features and the
    (B, 2d) embeddings stay on device; B is round-invariant so shapes are
    stable (the repo's shape-stability rule)."""
    from nnal_tpu.scoring.representative import (
        badge_embeddings,
        badge_kmeanspp,
    )

    res = ctx.evaluator.evaluate(ctx.params, ctx.pool_inds,
                                 ("posteriors", "feature_layer"),
                                 as_device=True)
    p1 = np.asarray(res["posteriors"])
    B = min(ctx.B, len(ctx.pool_inds))
    sel = np.asarray(binary_uncertainty_filter(p1, B))
    E = badge_embeddings(res["feature_layer"][jnp.asarray(sel)],
                         jnp.asarray(p1[sel]))
    chosen = np.asarray(badge_kmeanspp(
        E, min(ctx.k, len(sel)), jax.random.fold_in(ctx.jax_rng, 7)))
    return sel[chosen]


@register_strategy("BatchBALD")
def _batchbald(ctx: QueryContext):
    """BatchBALD — a TPU-native EXTRA beyond the reference's strategy set
    (Kirsch et al., NeurIPS 2019): greedy JOINT mutual information over the
    MC-dropout posterior stack, so the k queries are informative AND
    mutually non-redundant (plain BALD's top-k are often near-duplicates).
    Candidates = top-B by BALD from the same (T, n) stack BALD already
    sweeps — no extra pool passes; the candidate gather happens host-side
    so the only device arrays are the bucket-padded score pass and the
    round-invariant (T, B) slab (shape-stability rule); the greedy loop is
    one device program (``scoring.batchbald``)."""
    from nnal_tpu.scoring.batchbald import batchbald_select

    mc = mc_stack_posteriors(ctx.evaluator, ctx.params, ctx.pool_inds,
                             ctx.MC_iters, ctx.jax_rng)
    scores = bald_scores_bucketed(mc)
    B = min(ctx.B, len(ctx.pool_inds))
    sel = np.argsort(-scores, kind="stable")[:B]
    chosen = np.asarray(batchbald_select(
        jnp.asarray(mc[:, sel]), min(ctx.k, B),
        jax.random.fold_in(ctx.jax_rng, _BB_CFG_FOLD)))
    return sel[chosen]


def _committee_posteriors(ctx: QueryContext) -> np.ndarray:
    """(E, n) pool posteriors across the ensemble (reference
    PW_NNAL.py:453-545: pre-trained weight sets, or re-finetuned copies)."""
    assert ctx.ensemble_params, "ensemble methods need ensemble_params"
    rows = []
    for p in ctx.ensemble_params:
        rows.append(ctx.evaluator.evaluate(p, ctx.pool_inds,
                                           ("posteriors",))["posteriors"])
    return np.stack(rows)


@register_strategy("ensemble")
def _ensemble(ctx: QueryContext):
    """Average committee posteriors -> binary uncertainty (reference
    PW_NNAL.py:453-490), with the reference's running average."""
    posts = _committee_posteriors(ctx)
    avg = 0.0
    for i in range(posts.shape[0]):
        avg = (posts[i] + i * avg) / (i + 1)
    return np.asarray(binary_uncertainty_filter(avg, ctx.k))


@register_strategy("QBC-JS")
def _qbc_js(ctx: QueryContext):
    posts = _committee_posteriors(ctx)
    # qbc_js_scores == bald_from_mc across members; bucketed for the
    # shape-stability rule (pool shrinks every round)
    scores = bald_scores_bucketed(posts)
    return np.argsort(-scores, kind="stable")[:ctx.k]


@register_strategy("SuPix")
def _supix(ctx: QueryContext):
    """Superpixel querying (reconstructed; the reference's path is broken,
    SURVEY.md §2.9): SLIC-oversegment the first modality, score pool voxels
    by |p-0.5|, pick the k superpixels whose minimum member uncertainty is
    lowest, and query all their pool members (whole-superpixel labels)."""
    from nnal_tpu.scoring.superpixel import oversegment_volume, supix_query

    overseg = ctx.extra.get("overseg")
    if overseg is None:
        assert ctx.raw_volume is not None
        overseg = oversegment_volume(ctx.raw_volume,
                                     ctx.extra.get("n_segments", 64))
        ctx.extra["overseg"] = overseg
    p1 = _posteriors(ctx)
    unc = np.abs(p1 - 0.5)
    _, members = supix_query(overseg, ctx.pool_inds, unc, ctx.k)
    if not members:
        return np.zeros(0, dtype=np.int64)
    wanted = np.unique(np.concatenate(members))
    # positions of pool voxels inside the selected superpixels
    return np.flatnonzero(np.isin(ctx.pool_inds, wanted))


def _au_4u_scores(ctx: QueryContext) -> np.ndarray:
    """Per-pool-voxel AU_4U divergence scores (higher = more unstable)."""
    from nnal_tpu.models.perturb import measure_output_perturbation
    from nnal_tpu.scoring.grid_eval import GridPoolEvaluator

    ev = ctx.evaluator
    _require_patch_evaluator(ev, "AU_4U")
    teacher = ctx.extra.get("teacher_params")
    std = ctx.extra.get("gaussian_noise_std", 0.05)
    angle = ctx.extra.get("rotation_angle")
    measure = ctx.extra.get("output_perturbation_measure", "CE")
    rows = ev._grid_rows(ctx.pool_inds) \
        if isinstance(ev, GridPoolEvaluator) and ev._sweep_ok else None
    if rows is not None:
        # grid pools: single-dispatch whole-volume im2col sweep (the same
        # production path every other pool-scale op uses)
        scores = ev.perturb_sweep(ctx.params, ctx.jax_rng,
                                  teacher_params=teacher, measure=measure,
                                  gaussian_std=std,
                                  rotation_angle=angle)[rows]
    else:
        # arbitrary-index fallback: bucket-pad the ragged tail so the
        # chunk program has ONE stable shape as the pool shrinks round
        # over round (shape-stability standing rule)
        chunk = ev.ntb
        n = len(ctx.pool_inds)
        n_pad = -n % chunk
        inds = np.concatenate([np.asarray(ctx.pool_inds, np.int64),
                               np.zeros(n_pad, np.int64)])
        scores = []
        for lo in range(0, len(inds), chunk):
            cand = inds[lo:lo + chunk]
            x = gather_patches_normalized(
                ev.padded, jnp.asarray(cand), ev.mu, ev.sd, ev.patch_shape,
                ev.orig_shape)
            div = measure_output_perturbation(
                ctx.spec, ctx.params, x,
                jax.random.fold_in(ctx.jax_rng, lo),
                teacher_params=teacher, measure=measure, gaussian_std=std,
                rotation_angle=angle)
            scores.append(np.asarray(div))
        scores = np.concatenate(scores)[:n]
    return scores


@register_strategy("AU_4U")
def _au_4u(ctx: QueryContext):
    """Output-perturbation uncertainty querying (reference AU_4U:
    ``measure_output_perturbation`` + ``perturb_input``,
    NN_extended.py:913,1502): score each pool patch by the divergence
    between the model's clean posterior and the (teacher) model's posterior
    on a noised/rotated copy; query the k most unstable.  Grid pools ride
    the single-dispatch whole-volume im2col sweep."""
    scores = _au_4u_scores(ctx)
    return np.argsort(-scores, kind="stable")[:ctx.k]


def _s_test_dispatch(extra: Dict, spec, params, tx, ty, damping,
                     n_tr: int, jax_rng):
    """s_test solver seam: ``cg`` (device Newton-CG, the reference's exact
    semantics) or ``arnoldi`` (low-rank Lanczos eigenbasis approximation,
    Schioppa et al. arXiv:2112.03052 — config ``influence_mode=arnoldi``,
    ``arnoldi_rank``).  Both weight padding rows to exact no-ops."""
    from nnal_tpu.scoring.influence import s_test

    mode = extra.get("influence_mode", "cg")
    if mode == "arnoldi":
        from nnal_tpu.scoring.hessian import arnoldi_s_test

        st, _ = arnoldi_s_test(
            spec, params, tx, ty, tx, ty,
            rank=int(extra.get("arnoldi_rank", 8)),
            key=jax.random.fold_in(jax_rng, _ARNOLDI_KEY_FOLD),
            damping=damping, n_valid=n_tr, q_n_valid=n_tr)
        return st
    if mode != "cg":
        # a typo'd mode silently running cg would mislabel benchmark rows
        raise ValueError(f"unknown influence_mode {mode!r}; "
                         "expected 'cg' or 'arnoldi'")
    return s_test(spec, params, tx, ty, tx, ty, damping=damping,
                  n_valid=n_tr, q_n_valid=n_tr)


@register_strategy("influence")
def _influence(ctx: QueryContext):
    """Influence-function querying (driver config #4; reference
    ``Influence.PW_sample_influence``, Influence.py:369-453): s_test =
    (H_train + damping)^-1 grad L(labeled set); candidates ranked by the
    magnitude of their influence ``|<grad L(z), s_test>|`` — the pool
    samples whose labels would move the current model most."""
    from nnal_tpu.core.profiling import subphase
    from nnal_tpu.data.patches import gather_labels
    from nnal_tpu.data.batching import make_onehot
    from nnal_tpu.scoring.influence import influence_scores

    assert ctx.train_inds is not None and len(ctx.train_inds) > 0, \
        "influence querying needs a labeled set"
    ev = ctx.evaluator
    _require_patch_evaluator(ev, "influence")
    mask = ctx.extra.get("mask")
    assert mask is not None, "influence querying needs the label mask"

    # bucket the labeled gather so shapes (and compiles) are stable as the
    # labeled set grows round over round
    with subphase("influence/labeled_gather"):
        n_tr = len(ctx.train_inds)
        n_pad = -n_tr % 256
        tr_inds = np.concatenate([np.asarray(ctx.train_inds, np.int64),
                                  np.zeros(n_pad, np.int64)])
        tr = gather_patches_normalized(ev.padded, jnp.asarray(tr_inds),
                                       ev.mu, ev.sd, ev.patch_shape,
                                       ev.orig_shape)
        y_lab = np.zeros(len(tr_inds), np.int64)
        y_lab[:n_tr] = np.asarray(gather_labels(mask, ctx.train_inds,
                                                ev.orig_shape), np.int64)
        tr_y = make_onehot(y_lab, ctx.spec.nclass)
    damping = ctx.extra.get("damping", 0.1)
    # the same validity mask weights BOTH the Hessian and the query
    # gradient: padding rows are exact no-ops, so s_test (and every
    # influence ranking) is identical to the unpadded computation
    with subphase("influence/s_test"):
        st = _s_test_dispatch(ctx.extra, ctx.spec, ctx.params, tr, tr_y,
                              damping, n_tr, ctx.jax_rng)
        # tunnel-honest span boundary: pull ONE scalar of the result
        # (block_until_ready returns early under axon; a full tree pull
        # would cost ~10 s — this one tiny cached program forces the CG
        # program to finish so its time lands in THIS span, not the sweep)
        float(jax.tree_util.tree_leaves(st)[0].ravel()[0])

    # candidate scores at their current pseudo-labels (model predictions)
    B = min(ctx.B, len(ctx.pool_inds))
    with subphase("influence/posteriors"):
        p1 = _posteriors(ctx)
    with subphase("influence/filter"):
        sel = np.asarray(binary_uncertainty_filter(p1, B))
    with subphase("influence/cand_scores"):
        cand = ctx.pool_inds[sel]
        cx = gather_patches_normalized(ev.padded, jnp.asarray(cand),
                                       ev.mu, ev.sd, ev.patch_shape,
                                       ev.orig_shape)
        pseudo = (p1[sel] > 0.5).astype(np.int64)
        cy = make_onehot(pseudo, ctx.spec.nclass)
        scores = influence_scores(ctx.spec, ctx.params, st, cx, cy)
    order = np.argsort(-np.abs(scores), kind="stable")[:ctx.k]
    return sel[order]


@register_strategy("fi")
def _fi(ctx: QueryContext):
    """Fisher-information querying (reference PW_NNAL.py:89-163).

    The scoring tail (candidate gather -> shrunk grads -> A-matrices) is
    ONE fused device program (scoring.gradients.gather_shrunk_a_matrices)
    — same math as :func:`~nnal_tpu.scoring.fisher.fi_select` (which
    remains the array-level API), minus two dispatches and the patch
    materialization."""
    from nnal_tpu.core.profiling import subphase
    from nnal_tpu.scoring.gradients import gather_shrunk_a_matrices
    from nnal_tpu.scoring.sdp import fi_query_distribution
    from nnal_tpu.scoring.pmf import sample_query_pmf

    if not hasattr(ctx.evaluator, "padded"):
        # dense (FCN) specs: no per-patch full-network gradient exists,
        # so the A-matrices come from HALLUCINATED last-layer gradients
        # over the per-pixel probe features (the BADGE construction
        # feeding the reference's A -> SDP -> PMF tail; clearly an
        # approximation of the reference's shrunk full gradients —
        # scoring/fisher.hallucinated_class_grads docstring)
        return _fi_dense(ctx)
    with subphase("fi/posteriors"):
        p1 = _posteriors(ctx)
    B = min(ctx.B, len(ctx.pool_inds))
    sel = np.asarray(binary_uncertainty_filter(p1, B))
    cand_inds = ctx.pool_inds[sel]
    ev = ctx.evaluator
    with subphase("fi/gather_grads_A"):
        A = np.asarray(gather_shrunk_a_matrices(
            ctx.spec, ctx.params, ev.padded, jnp.asarray(cand_inds),
            ev.mu, ev.sd, ev.patch_shape, ev.orig_shape,
            jnp.asarray(np.asarray(p1[sel], np.float32)), ctx.diag_load))
    X_pool = None
    if ctx.lambda_ > 0:
        from nnal_tpu.scoring.fisher import refine_feature_matrix

        with subphase("fi/features"):
            feats = ev.evaluate(ctx.params, cand_inds,
                                ("feature_layer",))["feature_layer"]
        ref_F = refine_feature_matrix(np.asarray(feats).T, len(sel))
        X_pool = ref_F - ref_F.mean(axis=1, keepdims=True)
    with subphase("fi/sdp"):
        q = fi_query_distribution(A, ctx.lambda_, X_pool, ctx.k)
    with subphase("fi/pmf"):
        picks = sample_query_pmf(q, ctx.k, ctx.rng, replacement=True)
    return sel[picks]


def _fi_dense(ctx: QueryContext):
    """fi for dense (FCN) specs: last-layer Fisher over per-pixel probe
    features — ONE evaluate (posteriors + features), then the standard
    uncertainty filter -> A-matrices -> device SDP -> PMF tail.  The
    (B, c(d+1), c(d+1)) A-matrices are tiny (probe d = growth)."""
    from nnal_tpu.core.profiling import subphase
    from nnal_tpu.scoring.fisher import (
        a_matrices,
        a_matrices_multiclass,
        hallucinated_class_grads,
    )
    from nnal_tpu.scoring.pmf import sample_query_pmf
    from nnal_tpu.scoring.sdp import fi_query_distribution

    with subphase("fi/posteriors"):
        res = ctx.evaluator.evaluate(ctx.params, ctx.pool_inds,
                                     ("posteriors", "feature_layer"),
                                     as_device=True)
        p1 = np.asarray(res["posteriors"])
    with subphase("fi/filter"):
        B = min(ctx.B, len(ctx.pool_inds))
        p_rank = p1 if p1.ndim == 1 else p1[:, 1]
        sel = np.asarray(binary_uncertainty_filter(p_rank, B))
    with subphase("fi/gather_grads_A"):
        F_sel = res["feature_layer"][jnp.asarray(sel)]
        p_sel = jnp.asarray(p1[sel], jnp.float32)
        g = hallucinated_class_grads(F_sel, p_sel)
        if p_sel.ndim == 1:
            A = np.asarray(a_matrices(g, p_sel, ctx.diag_load))
        else:
            A = np.asarray(a_matrices_multiclass(g, p_sel,
                                                 ctx.diag_load))
    X_pool = None
    if ctx.lambda_ > 0:
        from nnal_tpu.scoring.fisher import refine_feature_matrix

        ref_F = refine_feature_matrix(np.asarray(F_sel).T, len(sel))
        X_pool = ref_F - ref_F.mean(axis=1, keepdims=True)
    with subphase("fi/sdp"):
        q = fi_query_distribution(A, ctx.lambda_, X_pool, ctx.k)
    with subphase("fi/pmf"):
        picks = sample_query_pmf(q, ctx.k, ctx.rng, replacement=True)
    return sel[picks]


# --------------------------------------------------------------------------- #
# multi-subject dispatch (reference query_multimg, PW_NNAL.py:169-627)
# --------------------------------------------------------------------------- #
def query_multimg(contexts: Sequence[QueryContext], method_name: str,
                  k: int, rng) -> List[np.ndarray]:
    """Query across subjects: score each subject's pool with its own
    evaluator, select globally, return per-subject local positions.

    The reference concatenates per-subject scores and splits selections with
    ``global2local_inds``; identical index algebra is used here.
    """
    sizes = [len(c.pool_inds) for c in contexts]

    if method_name == "random":
        n = int(np.sum(sizes))
        pick = rng.permutation(n)[:k]
        return global2local_inds(pick, sizes)

    def _concat_pool_feats_posts(cs):
        """(device features, host posteriors) concatenated over subjects —
        the shared prologue of the feature-space methods; features stay on
        device (host round-trips of (pool, 4096) tensors cost GBs)."""
        F, p1 = [], []
        for c in cs:
            r = c.evaluator.evaluate(c.params, c.pool_inds,
                                     ("posteriors", "feature_layer"),
                                     as_device=True)
            F.append(r["feature_layer"])
            p1.append(np.asarray(r["posteriors"]))
        return jnp.concatenate(F), np.concatenate(p1)

    if method_name in ("entropy", "MC-entropy", "BALD", "ensemble",
                       "QBC-JS"):
        all_scores = []
        for c in contexts:
            if method_name == "entropy":
                p1 = _posteriors(c)
                s = np.abs(p1 - 0.5)
            elif method_name == "MC-entropy":
                avg = mc_average_posteriors(c.evaluator, c.params,
                                            c.pool_inds, c.MC_iters,
                                            c.jax_rng)
                s = np.abs(avg - 0.5)
            elif method_name == "BALD":
                mc = mc_stack_posteriors(c.evaluator, c.params, c.pool_inds,
                                         c.MC_iters, c.jax_rng)
                s = -bald_scores_bucketed(mc)
            else:
                posts = _committee_posteriors(c)
                if method_name == "ensemble":
                    avg = 0.0
                    for i in range(posts.shape[0]):
                        avg = (posts[i] + i * avg) / (i + 1)
                    s = np.abs(avg - 0.5)
                else:
                    s = -bald_scores_bucketed(posts)
            all_scores.append(s)
        cat = np.concatenate(all_scores)
        pick = np.argsort(cat, kind="stable")[:k]
        return global2local_inds(pick, sizes)

    if method_name == "ps-random":
        valid_per = [high_variance_filter(c.raw_volume,
                                          c.evaluator.patch_shape,
                                          c.hv_threshold, c.pool_inds)
                     for c in contexts]
        vsizes = [len(v) for v in valid_per]
        pick = rng.permutation(int(np.sum(vsizes)))[:k]
        local = global2local_inds(pick, vsizes)
        return [valid_per[i][local[i]] for i in range(len(contexts))]

    if method_name == "rep-entropy":
        # features + posteriors per subject, global uncertainty filter,
        # greedy representativeness on the concatenated feature space
        # (reference PW_NNAL.py:284-351); features stay on device
        F, p1 = _concat_pool_feats_posts(contexts)
        B = min(contexts[0].B, len(p1))
        sel = np.asarray(binary_uncertainty_filter(p1, B))
        rest = np.setdiff1d(np.arange(len(p1)), sel)
        if len(rest) == 0:
            pick = sel[:k]
        else:
            from nnal_tpu.scoring.representative import (
                rep_entropy_from_features,
            )

            chosen = rep_entropy_from_features(F, rest, sel, min(k, B))
            pick = sel[chosen]
        return global2local_inds(pick, sizes)

    if method_name == "BADGE":
        # global uncertainty filter over the concatenated pools, k-means++
        # over the candidates' gradient embeddings (device-resident; the
        # single-subject _badge lifted to the multi-subject index algebra)
        from nnal_tpu.scoring.representative import (
            badge_embeddings,
            badge_kmeanspp,
        )

        F, p1 = _concat_pool_feats_posts(contexts)
        B = min(contexts[0].B, len(p1))
        sel = np.asarray(binary_uncertainty_filter(p1, B))
        E = badge_embeddings(F[jnp.asarray(sel)], jnp.asarray(p1[sel]))
        chosen = np.asarray(badge_kmeanspp(
            E, min(k, len(sel)),
            jax.random.fold_in(contexts[0].jax_rng, 7)))
        return global2local_inds(sel[chosen], sizes)

    if method_name == "BatchBALD":
        # concatenated MC stacks with ONE shared dropout-key chain across
        # subjects, so MC sample t is the same weight draw everywhere and
        # the greedy joint-MI penalty sees cross-subject redundancy (with
        # per-subject keys, duplicate patches in different subjects would
        # look independent and both get selected); global top-B by BALD,
        # host-side candidate gather, one greedy device program
        from nnal_tpu.scoring.batchbald import batchbald_select

        shared_key = contexts[0].jax_rng
        mc = np.concatenate(
            [mc_stack_posteriors(c.evaluator, c.params, c.pool_inds,
                                 c.MC_iters, shared_key)
             for c in contexts], axis=1)
        scores = bald_scores_bucketed(mc)
        B = min(contexts[0].B, mc.shape[1])
        sel = np.argsort(-scores, kind="stable")[:B]
        chosen = np.asarray(batchbald_select(
            jnp.asarray(mc[:, sel]), min(k, B),
            jax.random.fold_in(shared_key, _BB_CFG_FOLD)))
        return global2local_inds(sel[chosen], sizes)

    if method_name == "core-set":
        # concatenated pool features vs all subjects' labeled features
        # (reference PW_NNAL.py:353-451 with its 1000-chunk streaming) —
        # everything stays on device (4096-d features x 100K-pools are
        # GBs; host round-trips dominated round latency)
        from nnal_tpu.scoring.representative import pad_rows

        F_u = jnp.concatenate([
            c.evaluator.evaluate(c.params, c.pool_inds,
                                 ("feature_layer",),
                                 as_device=True)["feature_layer"]
            for c in contexts])
        # bucket-pad the concatenated pool (shape-stability rule); pads
        # get sims0=+inf so the k-center argmin can never pick them
        n_u = F_u.shape[0]
        F_u, _ = pad_rows(F_u)
        Fn = normalize_rows(F_u)
        sims0 = jnp.full((F_u.shape[0],), -jnp.inf, jnp.float32)
        any_labeled = False
        for c in contexts:
            if c.train_inds is not None and len(c.train_inds) > 0:
                F_t = c.evaluator.evaluate(
                    c.params, c.train_inds, ("feature_layer",),
                    as_device=True)["feature_layer"]
                sims0 = jnp.maximum(sims0, cross_max_similarities(
                    F_u, F_t, as_device=True, keep_pad=True))
                any_labeled = True
        bf = contexts[0].extra.get("bootstrap_features")
        if not any_labeled and bf is not None:
            # core-set labeled bootstrap from held-out subjects
            # (reference PW_AL.py:809-822)
            sims0 = jnp.asarray(cross_max_similarities(
                F_u, bf, as_device=True, keep_pad=True))
            any_labeled = True
        if not any_labeled:
            sims0 = jnp.full((F_u.shape[0],), -jnp.inf)
        sims0 = jnp.where(jnp.arange(F_u.shape[0]) < n_u, sims0, jnp.inf)
        pick = np.asarray(core_set_select(Fn, sims0, min(k, n_u)))
        return global2local_inds(pick, sizes)

    if method_name == "fi":
        # global uncertainty filter, per-subject patch gather + shrunk
        # grads, concatenated A-matrices -> one SDP -> PMF sampling
        # (reference PW_NNAL.py:547-627)
        from nnal_tpu.core.profiling import subphase

        if not hasattr(contexts[0].evaluator, "padded"):
            # dense (FCN) specs: hallucinated last-layer Fisher over the
            # per-pixel probe features (see _fi_dense)
            return _fi_dense_multimg(contexts, k, rng)
        with subphase("fi/posteriors"):
            p1 = np.concatenate([_posteriors(c) for c in contexts])
        B = min(contexts[0].B, len(p1))
        with subphase("fi/filter"):
            sel = np.asarray(binary_uncertainty_filter(p1, B))
        sel_local = global2local_inds(sel, sizes)
        from nnal_tpu.scoring.gradients import gather_shrunk_a_matrices
        from nnal_tpu.scoring.sdp import fi_query_distribution
        from nnal_tpu.scoring.pmf import sample_query_pmf

        A_list, order = [], []
        for si, c in enumerate(contexts):
            li = sel_local[si]
            if len(li) == 0:
                continue
            cand = c.pool_inds[li]
            ev = c.evaluator
            # pad each subject's candidate slice to the (round-invariant)
            # filter size B: the per-subject split of the global
            # uncertainty filter varies every round, and jitting the
            # gather/grads on that count compiled fresh programs per
            # round on the remote compiler (the repo's shape-stability
            # rule; ~15 s/round observed in the 131K-pool campaigns).
            # The padded rows are sliced off after materialization.
            nb = len(cand)
            cand_p = np.concatenate(
                [np.asarray(cand, np.int64), np.zeros(B - nb, np.int64)])
            pv_p = np.zeros(B, np.float32)
            base = int(np.sum(sizes[:si]))
            pv_p[:nb] = p1[base + li]
            with subphase("fi/gather_grads_A"):
                # ONE fused dispatch per subject: patch gather -> shrunk
                # per-class grads -> A-matrices, materializing only the
                # (B, n_shrunk+1, n_shrunk+1) output (the round-2 fusion
                # lesson: the intermediate (B, patch, 4096) tensors never
                # leave the device)
                A_list.append(np.asarray(gather_shrunk_a_matrices(
                    c.spec, c.params, ev.padded, jnp.asarray(cand_p),
                    ev.mu, ev.sd, ev.patch_shape, ev.orig_shape,
                    jnp.asarray(pv_p),
                    contexts[0].diag_load))[:nb])
            order.append(base + li)
        A = np.concatenate(A_list)
        order = np.concatenate(order)
        X_pool = None
        if contexts[0].lambda_ > 0:
            # representativeness term: per-subject feature gathers for the
            # surviving candidates, concatenated in A/order order (mirrors
            # the single-subject _fi; without this the lambda config was
            # silently a no-op on the multi-subject path)
            from nnal_tpu.scoring.fisher import refine_feature_matrix

            with subphase("fi/features"):
                F_list = []
                for si, c in enumerate(contexts):
                    li = sel_local[si]
                    if len(li) == 0:
                        continue
                    F_list.append(np.asarray(c.evaluator.evaluate(
                        c.params, c.pool_inds[li],
                        ("feature_layer",))["feature_layer"]))
                F = np.concatenate(F_list)
            ref_F = refine_feature_matrix(F.T, len(order))
            X_pool = ref_F - ref_F.mean(axis=1, keepdims=True)
        with subphase("fi/sdp"):
            q = fi_query_distribution(A, contexts[0].lambda_, X_pool, k)
        with subphase("fi/pmf"):
            draws = sample_query_pmf(q, k, rng, replacement=True)
        pick = order[draws]
        return global2local_inds(pick, sizes)

    if method_name == "AU_4U":
        # per-subject single-dispatch sweeps, global top-k (most unstable)
        scores = np.concatenate([_au_4u_scores(c) for c in contexts])
        pick = np.argsort(-scores, kind="stable")[:k]
        return global2local_inds(pick, sizes)

    if method_name == "influence":
        return _influence_multimg(contexts, k)

    if method_name == "SuPix":
        # global selection of the k most-uncertain superpixels across all
        # subjects; queries = every pool member of the picked superpixels
        # (single-subject semantics of _supix, reference SuPix_query
        # PW_NNAL.py:883-1021, lifted to the multi-subject index algebra)
        from nnal_tpu.scoring.superpixel import (
            oversegment_volume,
            superpix_scores,
        )
        from nnal_tpu.data.indexing import expand_raveled_inds

        per_subject = []
        cand = []   # (min-uncertainty, subject, z, label)
        for si, c in enumerate(contexts):
            overseg = c.extra.get("overseg")
            if overseg is None:
                assert c.raw_volume is not None
                overseg = oversegment_volume(
                    np.asarray(c.raw_volume),
                    c.extra.get("n_segments", 64))
                c.extra["overseg"] = overseg
            p1 = _posteriors(c)
            unc = np.abs(p1 - 0.5)
            sp = superpix_scores(overseg, c.pool_inds, unc)
            per_subject.append(overseg)
            for z, lab in np.argwhere(np.isfinite(sp)):
                cand.append((sp[z, lab], si, int(z), int(lab)))
        cand.sort()
        out = [np.zeros(0, np.int64) for _ in contexts]
        for _, si, z, lab in cand[:k]:
            overseg = per_subject[si]
            m2d = np.flatnonzero(overseg[:, :, z].ravel() == lab)
            wanted = expand_raveled_inds(m2d, z, 2, overseg.shape)
            pos = np.flatnonzero(np.isin(contexts[si].pool_inds, wanted))
            out[si] = np.union1d(out[si], pos).astype(np.int64)
        return out

    raise ValueError(method_name)


def _fi_dense_multimg(contexts: Sequence[QueryContext], k: int, rng
                      ) -> List[np.ndarray]:
    """Multi-subject dense fi: per-subject dense sweeps (posteriors +
    per-pixel features), ONE global uncertainty filter, hallucinated
    last-layer A-matrices per subject, one SDP + PMF (the dense analog of
    the patch branch above; scoring/fisher.hallucinated_class_grads)."""
    from nnal_tpu.core.profiling import subphase
    from nnal_tpu.scoring.fisher import (
        a_matrices,
        a_matrices_multiclass,
        hallucinated_class_grads,
    )
    from nnal_tpu.scoring.pmf import sample_query_pmf
    from nnal_tpu.scoring.sdp import fi_query_distribution

    sizes = [len(c.pool_inds) for c in contexts]
    ref = contexts[0]
    with subphase("fi/posteriors"):
        results = [c.evaluator.evaluate(c.params, c.pool_inds,
                                        ("posteriors", "feature_layer"),
                                        as_device=True)
                   for c in contexts]
        p1 = np.concatenate([np.asarray(r["posteriors"])
                             for r in results])
    with subphase("fi/filter"):
        B = min(ref.B, len(p1))
        p_rank = p1 if p1.ndim == 1 else p1[:, 1]
        sel = np.asarray(binary_uncertainty_filter(p_rank, B))
    sel_local = global2local_inds(sel, sizes)
    A_list, order = [], []
    with subphase("fi/gather_grads_A"):
        for si, c in enumerate(contexts):
            li = sel_local[si]
            if len(li) == 0:
                continue
            base = int(np.sum(sizes[:si]))
            F_sel = results[si]["feature_layer"][jnp.asarray(li)]
            p_sel = jnp.asarray(p1[base + li], jnp.float32)
            g = hallucinated_class_grads(F_sel, p_sel)
            if p_sel.ndim == 1:
                A_list.append(np.asarray(
                    a_matrices(g, p_sel, ref.diag_load)))
            else:
                A_list.append(np.asarray(
                    a_matrices_multiclass(g, p_sel, ref.diag_load)))
            order.append(base + li)
    A = np.concatenate(A_list)
    order = np.concatenate(order)
    with subphase("fi/sdp"):
        q = fi_query_distribution(A, ref.lambda_, None, k)
    with subphase("fi/pmf"):
        draws = sample_query_pmf(q, k, rng, replacement=True)
    return global2local_inds(order[draws], sizes)


def _influence_multimg(contexts: Sequence[QueryContext], k: int
                       ) -> List[np.ndarray]:
    """Influence querying across subjects: ONE s_test from the union of all
    subjects' labeled sets (the model is shared), candidates from a global
    uncertainty filter, ranked by ``|<grad L(z), s_test>|``.  All gathers
    are bucket-padded (shape-stability standing rule)."""
    from nnal_tpu.core.profiling import subphase
    from nnal_tpu.data.batching import make_onehot
    from nnal_tpu.data.patches import gather_labels
    from nnal_tpu.scoring.influence import influence_scores

    sizes = [len(c.pool_inds) for c in contexts]
    ref = contexts[0]
    for c in contexts:
        _require_patch_evaluator(c.evaluator, "influence")

    # union labeled set, per-subject bucket-padded gathers (the per-subject
    # labeled counts walk every round; the bucket keeps programs cached)
    with subphase("influence/labeled_gather"):
        xs, ys = [], []
        for c in contexts:
            if c.train_inds is None or len(c.train_inds) == 0:
                continue
            mask = c.extra.get("mask")
            assert mask is not None, "influence querying needs label masks"
            ev = c.evaluator
            n_si = len(c.train_inds)
            tri = np.concatenate([np.asarray(c.train_inds, np.int64),
                                  np.zeros(-n_si % 64, np.int64)])
            x = np.asarray(gather_patches_normalized(
                ev.padded, jnp.asarray(tri), ev.mu, ev.sd, ev.patch_shape,
                ev.orig_shape))[:n_si]
            xs.append(x)
            ys.append(np.asarray(gather_labels(mask, c.train_inds,
                                               ev.orig_shape), np.int64))
        assert xs, "influence querying needs a labeled set"
        n_tr = int(sum(x.shape[0] for x in xs))
        pad = -n_tr % 256
        x_cat = np.concatenate(xs + [np.zeros((pad,) + xs[0].shape[1:],
                                              np.float32)])
        y_cat = np.concatenate(ys + [np.zeros(pad, np.int64)])
        tr_y = make_onehot(y_cat, ref.spec.nclass)
    damping = ref.extra.get("damping", 0.1)
    with subphase("influence/s_test"):
        st = _s_test_dispatch(ref.extra, ref.spec, ref.params, x_cat, tr_y,
                              damping, n_tr, ref.jax_rng)
        # tunnel-honest span boundary (see _influence): one scalar pull
        # forces the CG program to finish inside this span
        float(jax.tree_util.tree_leaves(st)[0].ravel()[0])

    # global uncertainty filter to B, candidates scored per subject
    with subphase("influence/posteriors"):
        p1 = np.concatenate([_posteriors(c) for c in contexts])
    B = min(ref.B, len(p1))
    with subphase("influence/filter"):
        sel = np.asarray(binary_uncertainty_filter(p1, B))
    sel_local = global2local_inds(sel, sizes)
    scores = np.zeros(len(p1))
    with subphase("influence/cand_scores"):
        for si, c in enumerate(contexts):
            li = sel_local[si]
            if len(li) == 0:
                continue
            cand = c.pool_inds[li]
            ev = c.evaluator
            n_c = len(cand)
            ci = np.concatenate([np.asarray(cand, np.int64),
                                 np.zeros(-n_c % 64, np.int64)])
            cx = np.asarray(gather_patches_normalized(
                ev.padded, jnp.asarray(ci), ev.mu, ev.sd, ev.patch_shape,
                ev.orig_shape))[:n_c]
            base = int(np.sum(sizes[:si]))
            pseudo = (p1[base + li] > 0.5).astype(np.int64)
            cy = make_onehot(pseudo, ref.spec.nclass)
            scores[base + li] = influence_scores(ref.spec, ref.params, st,
                                                 cx, cy)
    order = np.argsort(-np.abs(scores[sel]), kind="stable")[:k]
    return global2local_inds(sel[order], sizes)


def available_strategies() -> List[str]:
    return sorted(_STRATEGIES)
