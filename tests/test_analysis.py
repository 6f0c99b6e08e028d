"""Analysis suite: grid F1, whole-volume DCRF drivers, query similarity,
P/R time series, per-iteration test-score matrices (reference
PW_analyze_results.py:297-920)."""

import os

import numpy as np
import pytest

from nnal_tpu.core.config import ExperimentConfig
from nnal_tpu.data.io import synthetic_subject
from nnal_tpu.engine.analysis import (
    full_test_slice_dcrf,
    query_similarity_analysis,
)
from nnal_tpu.engine.analysis import test_scores_matrix as scores_matrix
from nnal_tpu.engine.multi_experiment import MultiImgExperiment
from nnal_tpu.engine.pw_experiment import PWExperiment
from nnal_tpu.evaluation.analysis import (
    full_model_eval,
    full_model_pred_dcrf,
    grid_based_f1,
    pr_curves_from_predicts,
)


@pytest.fixture(scope="module")
def pars():
    return {
        "model_name": "PW", "nclass": 2, "patch_shape": (9, 9, 1),
        "grid_spacing": 4, "k": 3, "B": 12, "ntb": 256, "b": 32,
        "epochs": 1, "MC_iters": 2, "learning_rate": 3e-4,
        "optimizer_name": "Adam", "dropout_rate": 0.2, "init_size": 4,
        "seed": 5,
    }


@pytest.fixture(scope="module")
def ran_expr(tmp_path_factory, pars):
    root = str(tmp_path_factory.mktemp("analysis") / "expr")
    vols, mask = synthetic_subject(shape=(20, 20, 6), n_modalities=1,
                                   seed=5, n_blobs=6)
    expr = PWExperiment(root, ExperimentConfig.from_pars(pars))
    expr.attach_subject(vols, mask)
    expr.prep_data()
    expr.add_method("entropy")
    expr.run_method("entropy", 6)   # 2 rounds
    return expr


def test_grid_based_f1(ran_expr):
    import jax
    import jax.numpy as jnp
    from nnal_tpu.models.checkpoint import load_checkpoint

    spec = ran_expr.build_model()
    ev = ran_expr.make_evaluator(spec)
    params = jax.tree_util.tree_map(jnp.asarray, load_checkpoint(
        os.path.join(ran_expr.root_dir, "entropy",
                     "curr_weights.npz"))[0])
    f1 = grid_based_f1(ev, params, ran_expr._mask, spacing=4)
    assert 0.0 <= f1 <= 1.0


def test_full_model_eval_and_dcrf(ran_expr, tmp_path):
    import jax
    import jax.numpy as jnp
    from nnal_tpu.models.checkpoint import load_checkpoint

    spec = ran_expr.build_model()
    ev = ran_expr.make_evaluator(spec)
    params = jax.tree_util.tree_map(jnp.asarray, load_checkpoint(
        os.path.join(ran_expr.root_dir, "entropy",
                     "curr_weights.npz"))[0])
    vols, mask = ran_expr._load_subject()
    slice_inds = [1, 3]

    preds, f1 = full_model_eval(ev, params, mask, slice_inds,
                                save_dir=str(tmp_path / "fme"))
    assert preds.shape == mask.shape
    assert 0.0 <= f1 <= 1.0
    assert os.path.exists(tmp_path / "fme" / "segs.npy")

    dpreds, df1 = full_model_pred_dcrf(ev, params, vols[0], mask,
                                       slice_inds,
                                       save_dir=str(tmp_path / "dcrf"))
    assert dpreds.shape == mask.shape
    assert 0.0 <= df1 <= 1.0
    assert os.path.exists(tmp_path / "dcrf" / "F1_score_dcrf.txt")


def test_pr_curves_from_predicts(tmp_path):
    labels = np.array([1, 0, 1, 1, 0])
    preds = np.array([[1, 0, 0, 1, 0],    # TP=2 FP=0 -> Pr=1, Rc=2/3
                      [1, 1, 1, 1, 1]])   # TP=3 FP=2 -> Pr=3/5, Rc=1
    p = str(tmp_path / "predicts.txt")
    np.savetxt(p, preds, fmt="%d")
    M = pr_curves_from_predicts(p, labels)
    np.testing.assert_allclose(M[:, 0], [1.0, 2 / 3])
    np.testing.assert_allclose(M[:, 1], [0.6, 1.0])


def test_query_similarity_analysis(ran_expr):
    sims = query_similarity_analysis(ran_expr, "entropy")
    assert len(sims) == 2          # two rounds journaled
    for S in sims:
        assert S.shape[0] == S.shape[1]
        np.testing.assert_allclose(np.diag(S), 1.0, atol=1e-5)
        assert np.all(S <= 1.0 + 1e-5)


def test_full_test_slice_dcrf(ran_expr):
    out = full_test_slice_dcrf([ran_expr], "entropy", slice_step=3)
    assert ran_expr.root_dir in out
    assert os.path.exists(os.path.join(ran_expr.root_dir, "entropy",
                                       "full_preds", "dcrf_segs.npy"))


def test_test_scores_matrix(tmp_path, pars):
    subs = [synthetic_subject(shape=(20, 20, 6), n_modalities=1, seed=s,
                              n_blobs=6) for s in range(2)]
    test = [synthetic_subject(shape=(20, 20, 6), n_modalities=1, seed=7,
                              n_blobs=6)]
    expr = MultiImgExperiment(str(tmp_path / "multi"),
                              ExperimentConfig.from_pars(pars))
    expr.attach_subjects(subs, test_subjects=test)
    expr.prep_data()
    expr.add_method("random")
    expr.run_method("random", 6)
    scores = scores_matrix(expr, "random")
    assert scores.shape == (1, 2)
    assert np.all((scores >= 0) & (scores <= 1))
    # resumable: start_ind re-reads the persisted matrix
    scores2 = scores_matrix(expr, "random", start_ind=2)
    np.testing.assert_allclose(scores2, scores)


def test_run_on_subjects(ran_expr, tmp_path):
    """Per-subject whole-volume prediction driver (reference
    run_on_subjects.py)."""
    from nnal_tpu.cli.run_on_subjects import run_on_subjects

    held = [synthetic_subject(shape=(20, 20, 6), n_modalities=1, seed=11,
                              n_blobs=6)]
    out = run_on_subjects(ran_expr, "entropy", held,
                          save_dir=str(tmp_path / "subj"))
    assert set(out) == {0}
    assert 0.0 <= out[0] <= 1.0
    segs = np.load(tmp_path / "subj" / "0" / "segs.npy")
    assert segs.shape == (20, 20, 6)


def test_query_type_analysis(ran_expr):
    """Per-round query partition types (reference get_queries_type /
    get_sample_type, PW_analyze_results.py:52-85): 0 masked / 1 hi-var
    bg / 2 lo-var bg, consistent with the mask for type 0."""
    from nnal_tpu.core.journal import MethodJournal, load_inds
    from nnal_tpu.engine.analysis import query_type_analysis

    types = query_type_analysis(ran_expr, "entropy")
    assert len(types) == 2          # two rounds journaled
    j = MethodJournal(ran_expr.root_dir, "entropy")
    mask_flat = ran_expr._mask.reshape(-1) > 0
    for it, t in zip(j.query_iters(), types):
        q = load_inds(os.path.join(j.queries_dir, f"{it}.txt"))
        assert len(t) == len(q)
        assert set(np.unique(t)) <= {0, 1, 2}
        # type 0 <=> the queried voxel is inside the mask
        np.testing.assert_array_equal(t == 0, mask_flat[q])
