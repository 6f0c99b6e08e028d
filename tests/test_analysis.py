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


def test_get_full_segs(tmp_path):
    """Dataset-level segmentation + scoring (reference get_full_segs,
    eval_utils.py:202-238): per-subject F1, optional post-process and
    nrrd persistence."""
    from nnal_tpu.evaluation.analysis import get_full_segs

    rng = np.random.default_rng(0)
    subjects = []
    for _ in range(2):
        mask = (rng.random((12, 12, 5)) > 0.7).astype(np.uint8)
        subjects.append(([mask.astype(np.float32)], mask))
    # segment_fn that thresholds the first modality == the mask itself
    segs, f1s = get_full_segs(lambda vols: (vols[0] > 0).astype(np.uint8),
                              subjects, save_dir=str(tmp_path / "segs"))
    assert len(segs) == 2 and f1s.shape == (2,)
    np.testing.assert_allclose(f1s, 1.0)
    from nnal_tpu.data.io import read_volume
    for i in range(2):
        back = read_volume(str(tmp_path / "segs" / f"seg_{i}.nrrd"))
        np.testing.assert_array_equal(back, segs[i])
    # post_process runs the component/hole pipeline without changing shape
    segs_pp, _ = get_full_segs(lambda vols: (vols[0] > 0).astype(np.uint8),
                               subjects[:1], post_process=True)
    assert segs_pp[0].shape == (12, 12, 5)


def test_eval_full_segs_explicit_partitions(tmp_path):
    """Per-axial-slab F1 with explicit boundaries (reference
    eval_utils.py:240-296): slab scores match direct f_measure on the
    slices, shared 1-D bounds broadcast, and nrrd paths load."""
    from nnal_tpu.data.formats import write_nrrd
    from nnal_tpu.evaluation.analysis import (
        eval_full_segs_explicit_partitions)
    from nnal_tpu.evaluation.metrics import f_measure

    rng = np.random.default_rng(1)
    segs = [(rng.random((10, 10, 9)) > 0.5).astype(np.uint8)
            for _ in range(2)]
    masks = [(rng.random((10, 10, 9)) > 0.5).astype(np.uint8)
             for _ in range(2)]
    overall, parts = eval_full_segs_explicit_partitions(
        segs, masks, [3, 6])
    assert overall.shape == (2,) and parts.shape == (2, 3)
    for i in range(2):
        assert overall[i] == f_measure(segs[i], masks[i])
        for j, sl in enumerate((slice(0, 3), slice(3, 6), slice(6, 9))):
            assert parts[i, j] == f_measure(segs[i][:, :, sl],
                                            masks[i][:, :, sl])
    # per-subject boundary matrix
    _, parts2 = eval_full_segs_explicit_partitions(
        segs, masks, np.array([[3, 6], [2, 7]]))
    assert parts2[1, 0] == f_measure(segs[1][:, :, :2], masks[1][:, :, :2])
    # path-based input round-trips through the nrrd reader
    seg_paths, mask_paths = [], []
    for i in range(2):
        sp = str(tmp_path / f"s{i}.nrrd")
        mp = str(tmp_path / f"m{i}.nrrd")
        write_nrrd(sp, segs[i]); write_nrrd(mp, masks[i])
        seg_paths.append(sp); mask_paths.append(mp)
    overall3, parts3 = eval_full_segs_explicit_partitions(
        seg_paths, mask_paths, [3, 6])
    np.testing.assert_allclose(overall3, overall)
    np.testing.assert_allclose(parts3, parts)


def test_eval_full_segs_label_percentage():
    """Mask-derived top/middle/bottom slabs (reference
    eval_utils.py:298-364): edges straddle the contiguous above-threshold
    band; gapless subjects keep zero partition rows."""
    from nnal_tpu.evaluation.analysis import (
        eval_full_segs_label_percentage)
    from nnal_tpu.evaluation.metrics import f_measure

    mask = np.zeros((10, 10, 12), np.uint8)
    mask[:, :, 4:8] = 1              # above-threshold band: slices 4..7
    seg = mask.copy()
    seg[0, 0, 0] = 1                 # one FP in the top slab
    overall, parts = eval_full_segs_label_percentage(
        [seg], [mask], label=1, percentage=0.5)
    # below-threshold slices = [0,1,2,3, 8,9,10,11] -> gap at 3->8:
    # edge_1=3, edge_2=8 (reference indexing: last/first below-threshold)
    assert parts.shape == (1, 3)
    assert parts[0, 0] == f_measure(seg[:, :, :3], mask[:, :, :3])
    assert parts[0, 1] == f_measure(seg[:, :, 3:8], mask[:, :, 3:8])
    assert parts[0, 2] == f_measure(seg[:, :, 8:], mask[:, :, 8:])
    assert overall[0] == f_measure(seg, mask)
    # a subject with no gap (band touches the top) keeps zeros
    m2 = np.zeros((10, 10, 12), np.uint8)
    m2[:, :, :6] = 1
    overall2, parts2 = eval_full_segs_label_percentage(
        [m2], [m2], label=1, percentage=0.5)
    assert overall2[0] == 1.0
    np.testing.assert_array_equal(parts2, 0.0)


def test_slice_query_preds(ran_expr):
    """Slice-restricted predictions of journaled queries (reference
    get_slice_preds, PW_analyze_results.py:87-135)."""
    import numpy as np

    from nnal_tpu.core.journal import MethodJournal, load_inds
    from nnal_tpu.engine.analysis import slice_query_preds

    j = MethodJournal(ran_expr.root_dir, "entropy")
    allq = np.concatenate([
        load_inds(os.path.join(j.queries_dir, f"{it}.txt"))
        for it in j.query_iters()])
    zs = np.unravel_index(allq, (20, 20, 6))[2]
    z = int(np.bincount(zs).argmax())   # a slice that definitely has queries
    preds, (rows, cols), flat = slice_query_preds(ran_expr, "entropy", z)
    assert len(preds) == int(np.sum(zs == z)) == len(rows) == len(flat)
    assert set(np.unique(preds)) <= {0, 1}
    np.testing.assert_array_equal(
        np.ravel_multi_index((rows, cols, np.full(len(rows), z)),
                             (20, 20, 6)), flat)
    # a slice with no queries returns empties
    empty_z = int(np.setdiff1d(np.arange(6), zs)[0]) if len(
        np.setdiff1d(np.arange(6), zs)) else None
    if empty_z is not None:
        p2, _, f2 = slice_query_preds(ran_expr, "entropy", empty_z)
        assert len(p2) == 0 and len(f2) == 0


def test_full_model_pred_dcrf3d(ran_expr, tmp_path):
    import jax
    import jax.numpy as jnp
    import pytest
    from nnal_tpu.models.checkpoint import load_checkpoint
    from nnal_tpu.runtime.crf_native import crf_native_available

    if not crf_native_available():
        pytest.skip("g++ toolchain unavailable")
    from nnal_tpu.evaluation.analysis import full_model_pred_dcrf3d

    spec = ran_expr.build_model()
    ev = ran_expr.make_evaluator(spec)
    params = jax.tree_util.tree_map(jnp.asarray, load_checkpoint(
        os.path.join(ran_expr.root_dir, "entropy",
                     "curr_weights.npz"))[0])
    vols, mask = ran_expr._load_subject()
    preds, f1 = full_model_pred_dcrf3d(ev, params, vols[0], mask, [1, 2, 3],
                                       save_dir=str(tmp_path / "d3"),
                                       iters=3)
    assert preds.shape == mask.shape
    assert 0.0 <= f1 <= 1.0
    assert set(np.unique(preds)) <= {0.0, 1.0}
    assert preds[:, :, [0, 4]].sum() == 0  # untouched slices stay empty
    assert os.path.exists(tmp_path / "d3" / "dcrf3d_segs.npy")
    assert os.path.exists(tmp_path / "d3" / "F1_score_dcrf3d.txt")


def test_matrix_mode_analysis_multi_subject(tmp_path, pars):
    """matrix=True analysis over a REAL MultiImgExperiment: each query is
    evaluated through ITS subject's evaluator (this used to raise
    AttributeError — make_evaluator/_load_subject are single-subject-only
    — and would have mixed voxel ids across subjects even with one)."""
    from nnal_tpu.engine.analysis import (
        query_similarity_analysis,
        query_type_analysis,
        slice_query_preds,
    )

    subs = [synthetic_subject(shape=(20, 20, 6), n_modalities=1, seed=s,
                              n_blobs=6) for s in range(2)]
    expr = MultiImgExperiment(str(tmp_path / "mmat"),
                              ExperimentConfig.from_pars(pars))
    expr.attach_subjects(subs)
    expr.prep_data()
    expr.add_method("random")
    expr.run_method("random", 6)

    sims = query_similarity_analysis(expr, "random", matrix=True)
    assert len(sims) == 2
    for S in sims:
        assert S.shape[0] == S.shape[1] and np.isfinite(S).all()
        np.testing.assert_allclose(np.diag(S), 1.0, atol=1e-5)

    types = query_type_analysis(expr, "random", matrix=True)
    assert len(types) == 2
    assert all(np.isin(t, [0, 1, 2]).all() for t in types)

    preds, (rows, cols), flat = slice_query_preds(expr, "random", 2,
                                                  matrix=True, subject=0)
    assert len(preds) == len(rows) == len(flat)
