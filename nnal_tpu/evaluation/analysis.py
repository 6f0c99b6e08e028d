"""Offline analysis: grid F1, whole-volume DCRF evaluation, P/R series.

Rebuild of the evaluator-level half of ``PW_analyze_results.py``:

* ``grid_based_f1`` (reference PW_analyze_results.py:772-800) — F1 over all
  grid samples of a subject;
* ``full_model_eval`` (reference PW_analyze_results.py:594-672) — dense
  slice-by-slice predictions + F1 over chosen slices;
* ``full_model_pred_dcrf`` (reference PW_analyze_results.py:449-538) —
  dense posteriors refined per-slice by the DenseCRF, then F1;
* ``pr_curves_from_predicts`` (reference ``get_eval_metrics``,
  PW_analyze_results.py:297-338) — precision/recall time series from a
  ``predicts.txt`` journal.

Experiment-coupled drivers (per-iteration test-score matrices, query
similarity) live in ``nnal_tpu.engine.analysis`` to keep the layer DAG
(evaluation must not import engine).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

from nnal_tpu.data.samplers import generate_grid_samples
from nnal_tpu.evaluation.crf import dcrf_postprocess_2d
from nnal_tpu.evaluation.inference import full_slice_patchwise
from nnal_tpu.evaluation.metrics import f_measure, preds_stats


def grid_based_f1(evaluator, params, mask, spacing: int = 10) -> float:
    """F1 over all grid samples of one subject (reference
    ``grid_based_F1``; degenerate precision/recall yields 0.0 instead of
    the reference's division error)."""
    inds, labels = generate_grid_samples(evaluator.orig_shape, spacing,
                                         np.asarray(mask))
    preds = evaluator.evaluate(params, inds, ("prediction",))["prediction"]
    return f_measure(np.asarray(preds), np.asarray(labels))


def full_model_eval(evaluator, params, mask_vol,
                    slice_inds: Sequence[int],
                    save_dir: Optional[str] = None):
    """Dense per-slice predictions over ``slice_inds`` + F1 on those slices
    (reference ``full_model_eval``).  Saves ``segs.npy`` + ``F1_score.txt``
    when ``save_dir`` is given (npz instead of the reference's nrrd — the
    volume codec is not a capability, the artifact is)."""
    mask_vol = np.asarray(mask_vol)
    planes = full_slice_patchwise(evaluator, params, slice_inds,
                                  "prediction")
    preds = np.zeros(mask_vol.shape)
    for z in slice_inds:
        preds[:, :, z] = planes[z]
    f1 = f_measure(preds[:, :, list(slice_inds)],
                   mask_vol[:, :, list(slice_inds)])
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        np.save(os.path.join(save_dir, "segs.npy"), preds.astype(np.uint8))
        np.savetxt(os.path.join(save_dir, "F1_score.txt"), [f1])
    return preds, f1


def full_model_pred_dcrf(evaluator, params, image_vol, mask_vol,
                         slice_inds: Sequence[int],
                         save_dir: Optional[str] = None,
                         iters: int = 5):
    """Dense posteriors refined slice-by-slice with the DenseCRF, then F1
    (reference ``full_model_pred_DCRF``).  Saves ``dcrf_segs.npy`` +
    ``F1_score_dcrf.txt`` under ``save_dir``."""
    image_vol = np.asarray(image_vol)
    mask_vol = np.asarray(mask_vol)
    planes = full_slice_patchwise(evaluator, params, slice_inds,
                                  "posteriors")
    dcrf_preds = np.zeros(image_vol.shape)
    for z in slice_inds:
        dcrf_preds[:, :, z] = dcrf_postprocess_2d(planes[z],
                                                  image_vol[:, :, z],
                                                  iters=iters)
    f1 = f_measure(dcrf_preds[:, :, list(slice_inds)],
                   mask_vol[:, :, list(slice_inds)])
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        np.save(os.path.join(save_dir, "dcrf_segs.npy"),
                dcrf_preds.astype(np.uint8))
        np.savetxt(os.path.join(save_dir, "F1_score_dcrf.txt"), [f1])
    return dcrf_preds, f1


def pr_curves_from_predicts(predicts_path: str, test_labels) -> np.ndarray:
    """(2, iters) precision/recall rows from a per-round ``predicts.txt``
    journal (reference ``get_eval_metrics``); degenerate rounds yield 0."""
    preds = np.atleast_2d(np.loadtxt(predicts_path))
    labels = np.asarray(test_labels)
    out = np.zeros((2, preds.shape[0]))
    for i in range(preds.shape[0]):
        P, N, TP, FP, TN, FN = preds_stats(preds[i], labels)
        out[0, i] = TP / (TP + FP) if TP + FP > 0 else 0.0
        out[1, i] = TP / P if P > 0 else 0.0
    return out
