"""Sequential AL across subjects.

Rebuild of ``PW_AL.sequential_AL`` (PW_AL.py:1295-1338): run a single-subject
experiment per subject in order, warm-starting each from the previous
subject's final weights.
"""

from __future__ import annotations

import os
import shutil
from typing import List, Optional

from nnal_tpu.core.config import ExperimentConfig
from nnal_tpu.engine.pw_experiment import PWExperiment


def sequential_al(root_dir: str, subjects: List, method_name: str,
                  max_queries: int, config: ExperimentConfig,
                  warm_start: bool = True) -> List:
    """``subjects``: list of ``(vols, mask)``; one sub-experiment directory
    per subject; warm-start chains ``curr_weights.npz`` forward."""
    results = []
    prev_weights: Optional[str] = None
    for i, (vols, mask) in enumerate(subjects):
        sub_root = os.path.join(root_dir, f"subject_{i}")
        expr = PWExperiment(sub_root, config)
        expr.attach_subject(vols, mask)
        if not os.path.exists(os.path.join(sub_root, "init_pool_inds.txt")):
            expr.prep_data()
        # resume guard: add_method RESETS membership and weights to the
        # init draw while the queries journal survives — re-invoking the
        # chain after a mid-run crash would corrupt every completed
        # subject's replay state.  Only initialize fresh method dirs
        # (run_method on a complete one is a cheap no-op).
        done_marker = os.path.join(sub_root, method_name,
                                   "curr_train_inds.txt")
        if not os.path.exists(done_marker):
            j = expr.add_method(method_name)
            if warm_start and prev_weights is not None:
                shutil.copy2(prev_weights, j.path("curr_weights.npz"))
        else:
            from nnal_tpu.core.journal import MethodJournal

            j = MethodJournal(sub_root, method_name)
        results.append(expr.run_method(method_name, max_queries))
        prev_weights = j.path("curr_weights.npz")
    return results
