"""Experiment-coupled analysis drivers.

Rebuild of the experiment-level half of ``PW_analyze_results.py``:

* ``test_scores_matrix`` (reference ``eval_MultimgAL``,
  PW_analyze_results.py:801-863) — per-iteration weight checkpoints
  evaluated against each test subject, accumulated resumably into
  ``test_scores.txt``;
* ``query_similarity_analysis`` (reference ``get_Qsims``,
  PW_analyze_results.py:886-920) — per-round pairwise cosine similarity of
  the queried patches' features;
* ``full_test_slice_dcrf`` (reference PW_analyze_results.py:727-770) —
  whole-volume DCRF evaluation driver over a set of experiments.
"""

from __future__ import annotations

import os
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.core.journal import MethodJournal, load_inds
from nnal_tpu.evaluation.analysis import full_model_pred_dcrf
from nnal_tpu.evaluation.metrics import f_measure
from nnal_tpu.models.checkpoint import load_checkpoint


def test_scores_matrix(expr, method_name: str,
                       start_ind: int = 0) -> np.ndarray:
    """(n_test_subjects, n_rounds) F-measures: round ``i``'s weight
    checkpoint ``curr_weights_<i+1>.npz`` scored on every test subject's
    grid, streamed resumably to ``<method>/test_scores.txt`` (reference
    ``eval_MultimgAL``)."""
    from nnal_tpu.data.samplers import generate_grid_samples
    from nnal_tpu.data.stats import multimg_stats

    j = MethodJournal(expr.root_dir, method_name)
    spec = expr.build_model()
    iters = j.query_iters()
    qnum = len(iters)
    imgnum = len(expr.test_subjects)
    save_path = j.path("test_scores.txt")
    scores = np.zeros((imgnum, qnum))
    if start_ind > 0 and os.path.exists(save_path):
        # the saved matrix may be narrower than the journal (rounds ran
        # since the last scoring pass) — copy it into the leading slice.
        # ndmin=2 keeps a single-column (imgnum, 1) save from loading as
        # a row vector (plain loadtxt squeezes, atleast_2d transposes).
        old = np.loadtxt(save_path, ndmin=2)
        r, c = min(old.shape[0], imgnum), min(old.shape[1], qnum)
        scores[:r, :c] = old[:r, :c]

    stats = multimg_stats(expr.test_subjects)
    evs = expr._evaluators(spec, expr.test_subjects, stats)
    for i in range(start_ind, qnum):
        wpath = j.path(f"curr_weights_{iters[i] + 1}.npz")
        if not os.path.exists(wpath):
            continue
        # history checkpoints may be stored in float16 (hist_dtype);
        # upcast so the evaluator runs in its normal precision
        params = jax.tree_util.tree_map(
            lambda v: jnp.asarray(v, jnp.float32)
            if np.issubdtype(np.asarray(v).dtype, np.floating)
            else jnp.asarray(v),
            load_checkpoint(wpath)[0])
        for s, ev in enumerate(evs):
            vols, mask = expr.test_subjects[s]
            inds, labels = generate_grid_samples(
                np.asarray(vols[0]).shape, expr.config.data.grid_spacing,
                mask)
            preds = ev.evaluate(params, inds,
                                ("prediction",))["prediction"]
            scores[s, i] = f_measure(np.asarray(preds), labels)
        np.savetxt(save_path, scores)
    return scores


def query_similarity_analysis(expr, method_name: str, params=None,
                              matrix: bool = False) -> List[np.ndarray]:
    """Per-round (k, k) cosine-similarity matrices of the queried patches'
    feature vectors (reference ``get_Qsims``).  Pass ``matrix=True`` for
    multi-subject journals, whose query files are (voxel, subject) 2 x k
    matrices — a k=1 file is textually identical to two 1-D indices, so
    the journal's shape cannot be auto-detected."""
    j = MethodJournal(expr.root_dir, method_name)
    spec = expr.build_model()
    ev = expr.make_evaluator(spec)
    if params is None:
        params = jax.tree_util.tree_map(
            jnp.asarray, load_checkpoint(j.path("curr_weights.npz"))[0])
    sims = []
    for it in j.query_iters():
        q = load_inds(os.path.join(j.queries_dir, f"{it}.txt"),
                      matrix=matrix)
        if q.ndim == 2:          # multi-subject: take the voxel row
            q = q[0]
        F = ev.evaluate(params, q, ("feature_layer",))["feature_layer"]
        F = np.asarray(F)
        norms = np.linalg.norm(F, axis=1, keepdims=True)
        Fn = F / np.maximum(norms, 1e-12)
        sims.append(Fn @ Fn.T)
    return sims


def query_type_analysis(expr, method_name: str, var_kernel: int = 5,
                        var_thr: float = 2.0, matrix: bool = False
                        ) -> List[np.ndarray]:
    """Per-round partition types of the queried voxels — 0 masked /
    1 high-variance background / 2 low-variance background (reference
    ``get_queries_type``/``get_sample_type``, PW_analyze_results.py:52-85;
    there the type is the stored third column of a balanced-sampling
    ``inds.txt``, here it is recomputed from the mask and the same
    log-local-variance rule as ``data.samplers.sample_masked_volume``,
    patch_utils.py:628-792 — identical information, and it works for
    grid-sampled pools whose journal never stored types)."""
    from nnal_tpu.data.samplers import sample_types_of

    j = MethodJournal(expr.root_dir, method_name)
    vols, mask = expr._load_subject()
    img = np.asarray(vols[0])
    types = []
    for it in j.query_iters():
        q = load_inds(os.path.join(j.queries_dir, f"{it}.txt"),
                      matrix=matrix)
        if q.ndim == 2:          # multi-subject: take the voxel row
            q = q[0]
        types.append(sample_types_of(img, mask, q, var_kernel=var_kernel,
                                     var_thr=var_thr))
    return types


def slice_query_preds(expr, method_name: str, slice_: int, params=None,
                      matrix: bool = False):
    """Class predictions of a method's journaled queries restricted to one
    axial slice (reference ``get_slice_preds``,
    PW_analyze_results.py:87-135 — unrunnable there: it calls the missing
    ``PW_AL.create_dict``/``batch_eval_winds``, SURVEY §2.9).  Returns
    ``(preds, (rows, cols), flat_inds)`` for the queried voxels whose z
    coordinate equals ``slice_``."""
    j = MethodJournal(expr.root_dir, method_name)
    spec = expr.build_model()
    ev = expr.make_evaluator(spec)
    if params is None:
        params = jax.tree_util.tree_map(
            jnp.asarray, load_checkpoint(j.path("curr_weights.npz"))[0])
    vols, _ = expr._load_subject()
    shape = np.asarray(vols[0]).shape
    qs = []
    for it in j.query_iters():
        q = load_inds(os.path.join(j.queries_dir, f"{it}.txt"),
                      matrix=matrix)
        qs.append(q[0] if q.ndim == 2 else q)
    q = (np.concatenate(qs) if qs else np.zeros(0, np.int64))
    rows, cols, zs = np.unravel_index(q, shape)
    on = zs == slice_
    if not np.any(on):
        return np.zeros(0, np.int64), (rows[on], cols[on]), q[on]
    preds = ev.evaluate(params, q[on], ("prediction",))["prediction"]
    return np.asarray(preds), (rows[on], cols[on]), q[on]


def full_test_slice_dcrf(experiments: Sequence, method_name: str = "random",
                         slice_step: int = 2) -> dict:
    """Whole-volume DCRF evaluation over several experiments (reference
    ``full_test_slice_DCRF``): for each experiment, load the method's
    current weights, refine every ``slice_step``-th axial slice with the
    DenseCRF and save results under ``<method>/full_preds``."""
    out = {}
    for expr in experiments:
        j = MethodJournal(expr.root_dir, method_name)
        spec = expr.build_model()
        ev = expr.make_evaluator(spec)
        params = jax.tree_util.tree_map(
            jnp.asarray, load_checkpoint(j.path("curr_weights.npz"))[0])
        vols, mask = expr._load_subject()
        s3 = np.asarray(vols[0]).shape[2]
        slice_inds = np.arange(1, s3, slice_step)
        save_dir = j.path("full_preds")
        _, f1 = full_model_pred_dcrf(ev, params, np.asarray(vols[0]),
                                     np.asarray(mask), slice_inds,
                                     save_dir=save_dir)
        out[expr.root_dir] = f1
    return out
