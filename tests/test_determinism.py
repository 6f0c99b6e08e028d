"""Replay determinism: identical seeds must reproduce identical query
selections and metrics across fresh processes/objects — the property the
journaled RNG state exists for (SURVEY.md §5.2)."""

import numpy as np
import pytest

from nnal_tpu.cli.expr_handler import do_expr

OVERRIDES = ("patch_shape=[9,9,1],grid_spacing=4,k=5,B=30,ntb=256,b=32,"
             "epochs=1,MC_iters=2,init_size=6,seed=11")


@pytest.mark.parametrize("method", ["entropy", "MC-entropy", "fi"])
def test_identical_seeds_identical_queries(tmp_path, method):
    r1 = do_expr(str(tmp_path / "a"), method, 5, OVERRIDES, synthetic=True)
    r2 = do_expr(str(tmp_path / "b"), method, 5, OVERRIDES, synthetic=True)
    np.testing.assert_array_equal(np.sort(r1["train_inds"]),
                                  np.sort(r2["train_inds"]))
    np.testing.assert_allclose(r1["perf"], r2["perf"])


def test_different_seed_differs(tmp_path):
    r1 = do_expr(str(tmp_path / "a"), "random", 5, OVERRIDES,
                 synthetic=True)
    r2 = do_expr(str(tmp_path / "b"), "random", 5,
                 OVERRIDES.replace("seed=11", "seed=12"), synthetic=True)
    assert set(r1["train_inds"]) != set(r2["train_inds"])


def test_ps_random_e2e(tmp_path):
    res = do_expr(str(tmp_path / "ps"), "ps-random", 4, OVERRIDES,
                  synthetic=True)
    assert res["n_queries"] >= 1
    assert np.isfinite(res["perf"]).all()
