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
