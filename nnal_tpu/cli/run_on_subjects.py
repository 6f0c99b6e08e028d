"""Per-subject whole-volume prediction driver.

Rebuild of ``run_on_subjects.py`` (reference, whole file): for each held
subject, compute dense slice-by-slice predictions with a method's current
weights and save one segmentation volume (+ F-measure) per subject under
``<save_dir>/<i>/``.  The grid-level per-iteration half of the reference
script is covered by :func:`nnal_tpu.engine.analysis.test_scores_matrix`.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def run_on_subjects(expr, method_name: str, subjects: Sequence,
                    save_dir: Optional[str] = None,
                    params=None) -> dict:
    """``subjects``: list of ``(modality_vols, mask)``.  Returns
    {subject_index: F-measure}; saves ``segs.npy`` per subject when
    ``save_dir`` is given (npy instead of the reference's nrrd — the
    artifact, not the codec, is the capability)."""
    from nnal_tpu.core.journal import MethodJournal
    from nnal_tpu.data.patches import pad_volumes
    from nnal_tpu.data.stats import multimg_stats
    from nnal_tpu.evaluation.inference import full_volume_patchwise
    from nnal_tpu.evaluation.metrics import f_measure
    from nnal_tpu.models.checkpoint import load_checkpoint
    from nnal_tpu.scoring.grid_eval import GridPoolEvaluator

    spec = expr.build_model()
    if params is None:
        j = MethodJournal(expr.root_dir, method_name)
        params = jax.tree_util.tree_map(
            jnp.asarray, load_checkpoint(j.path("curr_weights.npz"))[0])
    patch_shape = tuple(expr.config.model.patch_shape)
    stats = multimg_stats(subjects)
    out = {}
    for i, (vols, mask) in enumerate(subjects):
        mu, sd = stats[i, 0::2], stats[i, 1::2]
        padded = pad_volumes(vols, patch_shape)
        orig = tuple(np.asarray(vols[0]).shape)
        ev = GridPoolEvaluator(spec, padded, mu, sd, patch_shape, orig,
                               grid_spacing=expr.config.data.grid_spacing,
                               ntb=expr.config.query.ntb)
        preds = full_volume_patchwise(ev, params, "prediction")
        f1 = f_measure(preds, np.asarray(mask))
        out[i] = f1
        if save_dir:
            sub = os.path.join(save_dir, str(i))
            os.makedirs(sub, exist_ok=True)
            np.save(os.path.join(sub, "segs.npy"),
                    preds.astype(np.uint8))
            np.savetxt(os.path.join(sub, "F1_score.txt"), [f1])
    return out
