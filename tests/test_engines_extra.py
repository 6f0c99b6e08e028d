"""Classification experiment + multi-subject experiment + sequential AL
smokes (reference AL.py, PW_AL.py:586+, PW_AL.py:1295)."""

import json
import os

import numpy as np
import pytest

from nnal_tpu.core.config import ExperimentConfig
from nnal_tpu.data.io import synthetic_subject
from nnal_tpu.engine.experiment import Experiment
from nnal_tpu.engine.multi_experiment import MultiImgExperiment
from nnal_tpu.engine.sequential import sequential_al


def _cls_data(n=120, seed=0):
    rng = np.random.default_rng(seed)
    X0 = rng.normal(size=(n // 2, 8, 8, 1)) - 1.5
    X1 = rng.normal(size=(n // 2, 8, 8, 1)) + 1.5
    X = np.concatenate([X0, X1]).astype(np.float32)
    y = np.repeat([0, 1], n // 2)
    perm = rng.permutation(n)
    return X[perm], y[perm]


@pytest.fixture(scope="module")
def cls_cfg():
    return ExperimentConfig.from_pars({
        "model_name": "PW", "nclass": 2, "patch_shape": (8, 8, 1),
        "k": 5, "B": 20, "ntb": 64, "b": 16, "epochs": 2,
        "learning_rate": 3e-4, "optimizer_name": "Adam",
        "dropout_rate": 0.2, "init_size": 10, "test_ratio": 0.25,
    })


def test_classification_experiment(tmp_path, cls_cfg):
    X, y = _cls_data()
    expr = Experiment(str(tmp_path / "cls"), cls_cfg)
    expr.attach_data(X, y)
    run = expr.add_run()
    assert run == 0
    expr.add_method("entropy", run)
    res = expr.run_method("entropy", run, 10)
    assert res["n_queries"] == 10
    assert len(res["accs"]) == 2
    assert np.isfinite(res["accs"]).all()
    # predicts.txt rows appended per round
    lines = open(os.path.join(str(tmp_path / "cls"), "0", "entropy",
                              "predicts.txt")).read().strip().split("\n")
    assert len(lines) == 2
    # per-phase timing stream (§5.1), same schema as the patch-wise engines
    rows = [json.loads(l) for l in
            open(os.path.join(str(tmp_path / "cls"), "0", "entropy",
                              "phases.jsonl"))]
    assert len(rows) == 2
    for r in rows:
        assert {"score_select", "train", "eval", "checkpoint"} <= set(r)
        assert 0.0 <= r["accuracy"] <= 1.0 and r["n_train"] > 0
    # second method over the same run, random baseline
    expr.add_method("random", run)
    res2 = expr.run_method("random", run, 5)
    assert res2["n_queries"] == 5
    curves = expr.summarize_all(["entropy", "random"])
    assert "entropy" in curves and len(curves["entropy"]) == 2


def test_classification_fi_and_egl(tmp_path, cls_cfg):
    X, y = _cls_data(60, seed=1)
    expr = Experiment(str(tmp_path / "cls2"), cls_cfg)
    expr.attach_data(X, y)
    run = expr.add_run()
    for m in ["fi", "egl", "rep-entropy"]:
        expr.add_method(m, run)
        res = expr.run_method(m, run, 4)
        assert res["n_queries"] >= 1
        assert np.isfinite(res["accs"]).all()


def test_run_management(tmp_path, cls_cfg):
    """get_runs/remove_run/organize_runs/reset_method/read_queries/eval_run
    (reference AL.py:112-145, 502-587)."""
    X, y = _cls_data(80, seed=2)
    expr = Experiment(str(tmp_path / "cls3"), cls_cfg)
    expr.attach_data(X, y)
    r0 = expr.add_run()
    r1 = expr.add_run()
    assert expr.get_runs() == ["0", "1"]
    expr.add_method("entropy", r1)
    res = expr.run_method("entropy", r1, 5)
    assert expr.read_queries("entropy", r1) == [5]

    # eval_run recomputes the accuracy curve from predicts.txt and matches
    # the curve recorded live during the campaign
    ev = expr.eval_run(r1, "accuracy")
    assert np.allclose(ev["entropy"], res["accs"])
    pr = expr.eval_run(r1, "PR", save=False)
    assert pr["entropy"].shape == (2, 1)
    assert ((pr["entropy"] >= 0) & (pr["entropy"] <= 1)).all()

    # reset_method wipes the journal back to the run's initial state
    expr.reset_method("entropy", r1)
    assert expr.read_queries("entropy", r1) == []
    tr, pool = __import__(
        "nnal_tpu.core.journal", fromlist=["MethodJournal"]
    ).MethodJournal(expr._run_dir(r1), "entropy").membership()
    init_tr = np.loadtxt(os.path.join(expr._run_dir(r1),
                                      "init_train_inds.txt"), dtype=np.int64)
    assert np.array_equal(np.sort(tr), np.sort(init_tr))

    # remove_run(0) deletes and renumbers: old run 1 (with its method dir)
    # becomes run 0
    expr.remove_run(r0)
    assert expr.get_runs() == ["0"]
    assert os.path.isdir(os.path.join(str(tmp_path / "cls3"), "0",
                                      "entropy"))


@pytest.fixture(scope="module")
def pw_cfg():
    return ExperimentConfig.from_pars({
        "model_name": "PW", "nclass": 2, "patch_shape": (9, 9, 1),
        "grid_spacing": 5, "k": 4, "B": 16, "ntb": 256, "b": 32,
        "epochs": 1, "MC_iters": 2, "learning_rate": 3e-4,
        "optimizer_name": "Adam", "dropout_rate": 0.2, "init_size": 4,
    })


def test_multi_subject_experiment(tmp_path, pw_cfg):
    subs = [synthetic_subject(shape=(24, 24, 8), n_modalities=1, seed=s)
            for s in range(2)]
    test_subs = [synthetic_subject(shape=(24, 24, 8), n_modalities=1,
                                   seed=9)]
    expr = MultiImgExperiment(str(tmp_path / "multi"), pw_cfg)
    expr.attach_subjects(subs, test_subs)
    expr.prep_data()
    expr.add_method("entropy")
    res = expr.run_method("entropy", 8)
    assert res["n_queries"] == 8
    assert len(res["perf"]) == 2
    assert np.isfinite(res["perf"]).all()
    # queries journal holds (voxel, subject) matrices
    q0 = np.loadtxt(os.path.join(str(tmp_path / "multi"), "entropy",
                                 "queries", "0.txt"))
    assert q0.shape[0] == 2
    # timing files recorded
    assert os.path.exists(os.path.join(str(tmp_path / "multi"),
                                       "AL_running_times", "dt_0"))
    # per-iteration weight checkpoints
    assert os.path.exists(os.path.join(str(tmp_path / "multi"), "entropy",
                                       "curr_weights_1.npz"))


def test_multi_subject_random(tmp_path, pw_cfg):
    subs = [synthetic_subject(shape=(20, 20, 6), n_modalities=1, seed=s)
            for s in range(2)]
    expr = MultiImgExperiment(str(tmp_path / "multi2"), pw_cfg)
    expr.attach_subjects(subs)
    expr.prep_data()
    expr.add_method("random")
    res = expr.run_method("random", 4)
    assert res["n_queries"] == 4


def test_async_checkpoint_campaign(tmp_path):
    """async_checkpoint=True: the campaign completes, every per-round save
    lands (final wait), and a fresh run_method call resumes from the
    async-written checkpoint exactly like the sync path."""
    from nnal_tpu.engine.pw_experiment import PWExperiment
    from nnal_tpu.models.checkpoint import load_checkpoint

    cfg = ExperimentConfig.from_pars({
        "model_name": "PW", "nclass": 2, "patch_shape": (9, 9, 1),
        "grid_spacing": 5, "k": 4, "B": 16, "ntb": 256, "b": 32,
        "epochs": 1, "MC_iters": 2, "learning_rate": 3e-4,
        "optimizer_name": "Adam", "dropout_rate": 0.2, "init_size": 4,
        "async_checkpoint": True,
    })
    vols, mask = synthetic_subject(shape=(24, 24, 8), n_modalities=1,
                                   seed=0)
    expr = PWExperiment(str(tmp_path / "async"), cfg)
    expr.attach_subject(vols, mask)
    expr.prep_data()
    expr.add_method("entropy")
    res = expr.run_method("entropy", 4)
    assert res["n_queries"] == 4
    ckpt = str(tmp_path / "async" / "entropy" / "curr_weights.npz")
    params, _, _, al_state = load_checkpoint(ckpt)
    assert al_state is not None and al_state["step"] > 0
    # continue the campaign from the async-written resume point
    res2 = expr.run_method("entropy", 8)
    assert res2["n_queries"] == 8


def test_sequential_al(tmp_path, pw_cfg):
    subs = [synthetic_subject(shape=(20, 20, 6), n_modalities=1, seed=s)
            for s in range(2)]
    results = sequential_al(str(tmp_path / "seq"), subs, "entropy", 4,
                            pw_cfg)
    assert len(results) == 2
    assert all(r["n_queries"] == 4 for r in results)
    # warm start: subject_1's initial weights came from subject_0's finals
    assert os.path.exists(os.path.join(str(tmp_path / "seq"), "subject_1",
                                       "entropy", "curr_weights.npz"))
