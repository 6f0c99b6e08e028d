"""End-to-end AL smoke on a synthetic subject (SURVEY.md §4 item 3):
state files appear, |pool| + |train| is invariant, metrics are finite,
resume continues from the journal."""

import os

import numpy as np
import pytest

from nnal_tpu.cli.expr_handler import create_expr, do_expr

pytestmark = pytest.mark.slow

OVERRIDES = ("patch_shape=[9,9,1],grid_spacing=4,k=5,B=30,ntb=256,b=32,"
             "epochs=1,MC_iters=2,init_size=6,learning_rate=1e-3")


@pytest.fixture(scope="module")
def expr_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("al_expr"))


def test_entropy_loop_end_to_end(expr_root):
    res = do_expr(expr_root, "entropy", 10, OVERRIDES, synthetic=True)
    assert res["n_queries"] == 10
    assert len(res["perf"]) == 2          # two rounds of k=5
    assert np.isfinite(res["perf"]).all()
    # state files exist
    for f in ["parameters.txt", "init_pool_inds.txt", "test_inds.txt",
              "train_stats.txt"]:
        assert os.path.exists(os.path.join(expr_root, f))
    mdir = os.path.join(expr_root, "entropy")
    assert os.path.exists(os.path.join(mdir, "queries", "0.txt"))
    assert os.path.exists(os.path.join(mdir, "curr_weights.npz"))
    assert os.path.exists(os.path.join(mdir, "state.json"))

    # membership invariant: train + pool = initial pool, disjoint
    init_pool = np.loadtxt(os.path.join(expr_root, "init_pool_inds.txt"),
                           dtype=np.int64)
    train = res["train_inds"]
    pool = res["pool_inds"]
    assert len(set(train) & set(pool)) == 0
    assert set(train) | set(pool) == set(init_pool.tolist())


def test_resume_continues(expr_root):
    """Re-invoking with a larger budget resumes, not restarts."""
    res = do_expr(expr_root, "entropy", 15, OVERRIDES, synthetic=True)
    assert res["n_queries"] == 15
    qdir = os.path.join(expr_root, "entropy", "queries")
    assert sorted(os.listdir(qdir)) == ["0.txt", "1.txt", "2.txt"]
    assert len(res["perf"]) == 3


def test_random_method_same_expr(expr_root):
    res = do_expr(expr_root, "random", 5, OVERRIDES, synthetic=True)
    assert res["n_queries"] == 5
    assert np.isfinite(res["perf"]).all()


def test_fi_method_small(expr_root):
    res = do_expr(expr_root, "fi", 4,
                  OVERRIDES.replace("k=5", "k=4").replace("B=30", "B=12"),
                  synthetic=True)
    assert res["n_queries"] == 4
    assert len(res["perf"]) >= 1
