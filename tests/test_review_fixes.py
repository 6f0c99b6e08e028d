"""Regression tests for the round-3 self-review findings.

Covers: the k=1 multi-subject query-journal ambiguity (a (2,1) matrix
file is textually identical to a 1-D length-2 file, so counting by ndim
double-counts it), the test_scores_matrix single-column resume transpose,
the pw engine's empty-pool loop guard, lwf_lambda wiring in the multi and
classification engines, and NRRD byte-skip / detached-NIfTI reads.
"""

import os
import struct

import numpy as np
import pytest

from nnal_tpu.core.journal import MethodJournal, load_inds, save_inds
from nnal_tpu.data import formats


# ---------------------------------------------------------------- journals
def test_load_inds_matrix_disambiguates_k1(tmp_path):
    p = str(tmp_path / "q.txt")
    np.savetxt(p, np.array([[7], [1]], dtype=np.int64), fmt="%d")
    # plain load cannot tell: it sees a 1-D length-2 array
    assert load_inds(p).shape == (2,)
    # matrix=True restores the (voxel, subject) 2 x 1 shape
    q = load_inds(p, matrix=True)
    assert q.shape == (2, 1)
    assert q[0, 0] == 7 and q[1, 0] == 1
    # wider matrices are unchanged
    np.savetxt(p, np.array([[7, 9, 4], [1, 0, 1]]), fmt="%d")
    assert load_inds(p, matrix=True).shape == (2, 3)
    # empty file: consistent empty shapes
    open(p, "w").close()
    assert load_inds(p).shape == (0,)
    assert load_inds(p, matrix=True).shape == (2, 0)


def test_n_queried_matrix_counts_k1_rounds(tmp_path):
    j = MethodJournal(str(tmp_path), "m")
    # round 0: 3 queries; round 1: exactly 1 query (the ambiguous case)
    np.savetxt(os.path.join(j.queries_dir, "0.txt"),
               np.array([[5, 6, 7], [0, 1, 0]]), fmt="%d")
    np.savetxt(os.path.join(j.queries_dir, "1.txt"),
               np.array([[9], [1]]), fmt="%d")
    assert j.n_queried(matrix=True) == 4
    # without the flag the k=1 round double-counts — the bug this guards
    assert j.n_queried() == 5


# ------------------------------------------------------- analysis resume
def test_single_column_scores_reload_shape(tmp_path):
    """A (imgnum, 1) test_scores.txt must reload as a column, not a row."""
    p = str(tmp_path / "test_scores.txt")
    saved = np.array([[0.5], [0.6], [0.7]])
    np.savetxt(p, saved)
    old = np.loadtxt(p, ndmin=2)        # the pattern the fix uses
    assert old.shape == (3, 1)
    scores = np.zeros((3, 4))
    r, c = min(old.shape[0], 3), min(old.shape[1], 4)
    scores[:r, :c] = old[:r, :c]
    np.testing.assert_allclose(scores[:, 0], [0.5, 0.6, 0.7])
    assert scores[:, 1:].sum() == 0.0


# ------------------------------------------------------- pw pool guard
def test_pw_run_method_terminates_on_empty_pool(tmp_path):
    """max_queries beyond the pool size must drain the pool and stop, not
    spin forever writing empty query files."""
    from nnal_tpu.core.config import ExperimentConfig
    from nnal_tpu.data.io import synthetic_subject
    from nnal_tpu.engine.pw_experiment import PWExperiment

    cfg = ExperimentConfig.from_pars({
        "model_name": "PW", "nclass": 2, "patch_shape": (9, 9, 1),
        "grid_spacing": 8, "k": 64, "B": 64, "ntb": 128, "b": 16,
        "epochs": 1, "learning_rate": 3e-4, "optimizer_name": "Adam",
        "init_size": 2,
    })
    vols, mask = synthetic_subject(shape=(20, 20, 6), n_modalities=1,
                                   seed=0)
    expr = PWExperiment(str(tmp_path / "e"), cfg)
    expr.attach_subject(vols, mask)
    expr.prep_data()
    expr.add_method("random")
    res = expr.run_method("random", 10 ** 6)   # far beyond the pool
    assert res["n_queries"] >= 1
    assert len(res["pool_inds"]) == 0          # pool fully consumed
    j = MethodJournal(str(tmp_path / "e"), "random")
    for it in j.query_iters():                 # no empty query files
        assert len(load_inds(os.path.join(j.queries_dir,
                                          f"{it}.txt"))) > 0


# ------------------------------------------------------------- lwf wiring
def test_lwf_lambda_wired_in_multi_and_classification(tmp_path):
    """Setting model.lwf_lambda must change training in EVERY engine —
    not just the single-subject one (silent per-engine config keys)."""
    import jax

    from nnal_tpu.core.config import ExperimentConfig
    from nnal_tpu.data.io import synthetic_subject
    from nnal_tpu.engine.multi_experiment import MultiImgExperiment

    def run(lmbda, root):
        cfg = ExperimentConfig.from_pars({
            "model_name": "PW", "nclass": 2, "patch_shape": (9, 9, 1),
            "grid_spacing": 6, "k": 3, "B": 12, "ntb": 128, "b": 16,
            "epochs": 2, "learning_rate": 1e-3, "optimizer_name": "Adam",
            "init_size": 4, "lwf_lambda": lmbda, "lwf_T": 2.0,
        })
        subs = [synthetic_subject(shape=(20, 20, 6), n_modalities=1,
                                  seed=s) for s in range(2)]
        expr = MultiImgExperiment(root, cfg)
        expr.attach_subjects(subs)
        expr.prep_data()
        expr.add_method("random")
        expr.run_method("random", 3)
        from nnal_tpu.models.checkpoint import load_checkpoint

        return load_checkpoint(
            os.path.join(root, "random", "curr_weights.npz"))[0]

    p0 = run(0.0, str(tmp_path / "off"))
    p1 = run(0.8, str(tmp_path / "on"))
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree_util.tree_leaves(p0),
                             jax.tree_util.tree_leaves(p1))]
    assert max(diffs) > 0.0, "lwf_lambda had no effect on multi finetune"


def test_lwf_lambda_wired_in_classification_engine(tmp_path):
    import jax

    from nnal_tpu.core.config import ExperimentConfig
    from nnal_tpu.engine.experiment import Experiment

    def run(lmbda, root):
        rng = np.random.default_rng(0)
        X = rng.normal(size=(40, 8, 8, 1)).astype(np.float32)
        y = (X.mean(axis=(1, 2, 3)) > 0).astype(np.int64)
        cfg = ExperimentConfig.from_pars({
            "model_name": "PW", "nclass": 2, "patch_shape": (8, 8, 1),
            "k": 4, "B": 16, "ntb": 64, "b": 8, "epochs": 2,
            "learning_rate": 1e-3, "optimizer_name": "Adam",
            "init_size": 8, "test_ratio": 0.25,
            "lwf_lambda": lmbda, "lwf_T": 2.0,
        })
        expr = Experiment(root, cfg)
        expr.attach_data(X, y)
        run_id = expr.add_run()
        expr.add_method("random", run_id)
        expr.run_method("random", run_id, 4)
        from nnal_tpu.models.checkpoint import load_checkpoint

        return load_checkpoint(os.path.join(
            root, str(run_id), "random", "curr_weights.npz"))[0]

    p0 = run(0.0, str(tmp_path / "off"))
    p1 = run(0.8, str(tmp_path / "on"))
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree_util.tree_leaves(p0),
                             jax.tree_util.tree_leaves(p1))]
    assert max(diffs) > 0.0, "lwf_lambda had no effect on _retrain"


# ------------------------------------------------------------- formats
def test_nrrd_byte_skip_detached(tmp_path):
    arr = np.arange(6, dtype=np.int32).reshape(2, 3)
    body = np.ascontiguousarray(arr.T).astype("<i4").tobytes()
    # positive byte skip
    open(str(tmp_path / "d.raw"), "wb").write(b"JUNKJUNK" + body)
    open(str(tmp_path / "d.nhdr"), "wb").write(
        b"NRRD0004\ntype: int\ndimension: 2\nsizes: 2 3\n"
        b"endian: little\nencoding: raw\nbyte skip: 8\ndata file: d.raw\n")
    back, _ = formats.read_nrrd(str(tmp_path / "d.nhdr"))
    np.testing.assert_array_equal(back, arr)
    # byte skip: -1 (data at end of file, raw only)
    open(str(tmp_path / "e.raw"), "wb").write(b"LONGERJUNK" + body)
    open(str(tmp_path / "e.nhdr"), "wb").write(
        b"NRRD0004\ntype: int\ndimension: 2\nsizes: 2 3\n"
        b"endian: little\nencoding: raw\nbyte skip: -1\ndata file: e.raw\n")
    back, _ = formats.read_nrrd(str(tmp_path / "e.nhdr"))
    np.testing.assert_array_equal(back, arr)
    # short payload raises instead of returning garbage
    open(str(tmp_path / "f.raw"), "wb").write(body[:-4])
    open(str(tmp_path / "f.nhdr"), "wb").write(
        b"NRRD0004\ntype: int\ndimension: 2\nsizes: 2 3\n"
        b"endian: little\nencoding: raw\ndata file: f.raw\n")
    with pytest.raises(ValueError, match="payload"):
        formats.read_nrrd(str(tmp_path / "f.nhdr"))


def test_nifti_detached_hdr_img_pair(tmp_path):
    arr = np.arange(12, dtype=np.int16).reshape(3, 2, 2)
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, 3, 3, 2, 2, 1, 1, 1, 1)
    struct.pack_into("<h", hdr, 70, 4)
    struct.pack_into("<h", hdr, 72, 16)
    struct.pack_into("<f", hdr, 108, 0.0)
    struct.pack_into("<2f", hdr, 112, 1.0, 0.0)
    hdr[344:348] = b"ni1\x00"
    open(str(tmp_path / "v.hdr"), "wb").write(bytes(hdr))
    open(str(tmp_path / "v.img"), "wb").write(
        np.ascontiguousarray(arr.T).astype("<i2").tobytes())
    back = formats.read_nifti(str(tmp_path / "v.hdr"))
    np.testing.assert_array_equal(back, arr)
