"""Shared engine helpers.

The anchor-replay arithmetic and the optimizer cache used to be inlined in
all three engines (classification, patch-wise, multi-subject); the copies
had already diverged once (the multi copy's k=1 query-matrix counting
bug), so the resume semantics now have exactly one home.
"""

from __future__ import annotations

import os
from typing import List

from nnal_tpu.core.journal import load_inds


def replay_prefix_lens(j, al_state, round_id: int, n_train: int,
                       matrix: bool = False) -> List[int]:
    """Labeled-set prefix lengths for the rounds an anchor resume must
    replay.

    With ``ckpt_full_every > 1`` the full (params + optimizer-moment)
    resume point is only written every K rounds; a crash between anchors
    resumes by re-running the journaled rounds' finetunes from the
    anchor.  Replay is bit-identical because query sets are journaled,
    each round's labeled set is a *prefix* of the current one (the loop
    only ever appends), and the finetune RNG is keyed on the optimizer
    step, not on a process cursor.

    Returns one prefix length per round in ``[anchor, round_id)`` —
    empty when the checkpoint already is the current round's state.
    ``matrix=True`` for multi-subject journals whose query files are
    (voxel, subject) 2 x k matrices (a k=1 file reads as 1-D length-2
    otherwise, shifting every prefix).
    """
    anchor = (0 if al_state is None
              else int(al_state.get("round", round_id)))
    if anchor >= round_id:
        return []
    counts = []
    for it in j.query_iters():
        a = load_inds(os.path.join(j.queries_dir, f"{it}.txt"),
                      matrix=matrix)
        counts.append(a.shape[1] if a.ndim == 2 else len(a))
    lens, n = [], n_train - sum(counts)
    for c in counts:
        n += c
        lens.append(n)
    return lens[anchor:round_id]


def anchor_dtype(model_cfg) -> str:
    return str(getattr(model_cfg, "ckpt_dtype", "float32"))


def adopt_anchor_rounding(state, model_cfg) -> bool:
    """Anchor bit-identity step: round the live (params, bn[, opt],
    teacher) to the anchor storage's representables and ADOPT the rounded
    values, immediately BEFORE a full (resume-point) save with
    ``ckpt_dtype`` bfloat16 or int8.  The checkpoint on disk then decodes
    to exactly the values the uninterrupted process keeps training with,
    so crash-resume == continue bit-for-bit (see
    ``models.checkpoint.round_trip_bf16`` / ``round_trip_int8``).
    Callers must capture the PRE-adoption tensors for the save itself —
    the save re-runs the same deterministic encode on those originals
    (int8's encode is not idempotent on its own output).  Optimizer
    moments are only rounded when they are part of the anchor
    (``opt_reset_per_round`` drops them from both).  Returns True when an
    adoption happened."""
    dt = anchor_dtype(model_cfg)
    if dt == "float32":
        return False
    from nnal_tpu.models.checkpoint import round_trip_bf16, round_trip_int8

    include_opt = not getattr(model_cfg, "opt_reset_per_round", False)
    if dt == "bfloat16":
        p, b, o, t = round_trip_bf16(
            (state.params, state.bn_state,
             state.opt_state if include_opt else None,
             getattr(state, "teacher_params", None)))
    elif dt == "int8":
        # weights: int8 per-out-slice quant-dequant; bn/opt (and any
        # non-matrix leaf) bf16 — the exact per-group rule the int8
        # save encoder applies (models.checkpoint._encode_payload_int8)
        p, t = round_trip_int8((state.params,
                                getattr(state, "teacher_params", None)))
        b, o = round_trip_bf16(
            (state.bn_state,
             state.opt_state if include_opt else None))
    else:
        raise ValueError(f"unsupported ckpt_dtype {dt!r}")
    state.params = p
    if state.bn_state is not None:
        state.bn_state = b
    if include_opt:
        state.opt_state = o
    if getattr(state, "teacher_params", None) is not None:
        state.teacher_params = t
    return True


def anchor_save_kwargs(model_cfg, state) -> dict:
    """The resume-point save's payload policy under the anchor-shrinking
    levers: storage dtype + whether the optimizer moments ride along.
    The mean-teacher EMA params (when the MT-SSL config is active) are
    part of the resume point — replay re-runs finetunes whose consistency
    term reads the teacher, so resume must restore it exactly."""
    include_opt = not getattr(model_cfg, "opt_reset_per_round", False)
    return {"dtype": getattr(model_cfg, "ckpt_dtype", "float32"),
            "opt_state": state.opt_state if include_opt else None,
            "teacher_params": getattr(state, "teacher_params", None)}


def maybe_reset_opt(state, tx, model_cfg) -> None:
    """``opt_reset_per_round``: warm-restart the optimizer at the top of
    each finetune.  Both the original run and any crash-resume replay go
    through this same reset, so replay stays bit-identical without the
    moments ever touching a checkpoint."""
    if getattr(model_cfg, "opt_reset_per_round", False):
        state.opt_state = tx.init(state.params)


def cached_tx(engine, model_cfg):
    """Reuse the optimizer across ``run_method`` calls: the jitted
    step/scan caches key on ``id(tx)``, so a fresh optax transformation
    per call would recompile the identical train program
    (shape-stability standing rule).  Returns the cached transformation
    when the (optimizer, lr) config is unchanged, else None (the caller
    builds a new one and stores it as ``engine._tx``)."""
    key = (model_cfg.optimizer_name, model_cfg.learning_rate)
    if getattr(engine, "_tx_key", None) == key:
        return getattr(engine, "_tx", None)
    engine._tx_key = key
    return None


def reconcile_membership(j, train_inds, pool_inds, *, matrix: bool = False,
                         to_global=None):
    """Repair the crash window between ``record_queries`` and
    ``init_membership``: the two are separate writes, so a process death
    in between leaves ``queries/<R>.txt`` on disk while the membership
    files still describe round R-1.  Unrepaired, the resume replays every
    prefix short by k (no longer bit-identical) and round R's queries
    silently re-enter the pool.

    Only the LAST journal file can be ahead (each round reconciles before
    writing the next).  Missing queries are appended in file order —
    preserving the prefix property anchor replay depends on.

    ``matrix`` journals ((voxel, subject) rows, multi-subject engine) need
    ``to_global``: a callable mapping the (2, k) matrix to the global ids
    used by that engine's membership.  Returns
    ``(train_inds, pool_inds, repaired)``.
    """
    import numpy as np

    iters = j.query_iters()
    if not iters:
        return train_inds, pool_inds, False
    last = load_inds(os.path.join(j.queries_dir, f"{iters[-1]}.txt"),
                     matrix=matrix)
    if matrix:
        last = to_global(last)
    present = np.isin(last, train_inds)
    if present.all():
        return train_inds, pool_inds, False
    missing = np.asarray(last)[~present]
    train_inds = np.concatenate([np.asarray(train_inds), missing])
    pool_inds = np.asarray(pool_inds)
    pool_inds = pool_inds[~np.isin(pool_inds, missing)]
    j.init_membership(train_inds, pool_inds)
    return train_inds, pool_inds, True


def warn_fcn_unsupported_keys(engine, model_cfg,
                              train_layers_ok: bool = True) -> None:
    """Warn (once per engine instance) when config keys the dense-model
    finetune path does not implement are set together with an fcn spec —
    the 'key works in one path, silently ignored in another' defect class
    (r02 fi diag_load).  Since r5 the fcn paths honor consistency_coeff
    (dense mean-teacher) and, on the single-subject engine, train_layers;
    lwf_lambda stays patch-only (dense distillation targets would need a
    per-pixel old-logit volume per round — unbudgeted; set
    ``train_layers_ok=False`` for engines whose fcn path also lacks the
    grad mask, mirroring their patch path)."""
    ignored = []
    if float(getattr(model_cfg, "lwf_lambda", 0.0)) > 0.0:
        ignored.append("lwf_lambda (LwF)")
    if not train_layers_ok and getattr(model_cfg, "train_layers", None):
        ignored.append("train_layers (partial training)")
    # key the once-guard on WHAT is ignored: a key set mid-campaign
    # (modify_parameters) must still warn the first time it is ignored
    if tuple(ignored) == getattr(engine, "_fcn_keys_warned", None):
        return
    if ignored:
        import warnings

        warnings.warn(
            "dense-model (fcn) finetune ignores config keys: "
            + ", ".join(ignored)
            + " — these are only implemented on the patch-wise path",
            stacklevel=3)
    engine._fcn_keys_warned = tuple(ignored)


def mt_rampdown(model_cfg, n_labeled: int):
    """(effective_cc, cc_scale) for the mean-teacher consistency term.

    ``consistency_off_labels = L > 0``: full strength below L/2 (the
    low-budget regime where MT's boost lives), then the reference's
    ``exp(-12.5 phase^2)`` ramp-DOWN shape (NN_extended.py:1462-1502,
    re-keyed from training epochs to the AL quantity that matters:
    labeled count) over the second half, and fully OFF (cc = 0 -> the
    engines build the plain runner, no teacher/unlabeled work) at
    ``n_labeled >= L``.  The scale is a TRACED argument of the scanned
    runner, so per-round decay never recompiles; it depends only on
    ``n_labeled``, so crash-resume replay is bit-identical."""
    import numpy as np

    cc = float(getattr(model_cfg, "consistency_coeff", 0.0))
    if cc <= 0.0:
        return cc, 1.0
    start = int(getattr(model_cfg, "consistency_start_labels", 0))
    if start > 0 and n_labeled < start:
        # the n=5 low8 evidence (CAMPAIGNS_r05): consistency against a
        # freshly-copied teacher at the seed budget DRAGS round 0
        # (0.704 vs plain 0.824, ~2 sigma) — let supervised training
        # separate student from teacher first
        return 0.0, 0.0
    off = int(getattr(model_cfg, "consistency_off_labels", 0))
    if off <= 0:
        return cc, 1.0
    if n_labeled >= off:
        return 0.0, 0.0
    half = off / 2.0
    if n_labeled <= half:
        return cc, 1.0
    phase = (n_labeled - half) / half
    return cc, float(np.exp(-12.5 * phase * phase))
