"""Config-driven mean-teacher SSL, end-to-end through the engines.

Round-3 verdict gap: the MT-SSL machinery existed at library level
(models/train.py teacher/consistency args, optim.ema_update) but no config
key or engine path reached it.  These tests drive it the documented way —
``consistency_coeff`` etc. in the config — through the patch-wise engine:
the EMA teacher must persist in the resume checkpoints (teacher/ group),
the consistency term must actually influence training, and crash-resume
must stay bit-identical (teacher trajectory + unlabeled batch stream
replayed exactly).  Reference: NN_extended.py:1337-1396.
"""

import os

import numpy as np
import pytest

from nnal_tpu.core.config import ExperimentConfig
from nnal_tpu.data.io import synthetic_subject
from nnal_tpu.models.checkpoint import load_checkpoint

pytestmark = pytest.mark.slow


def _cfg(**over):
    pars = {
        "model_name": "PW", "nclass": 2, "patch_shape": (9, 9, 1),
        "grid_spacing": 5, "k": 3, "B": 16, "ntb": 256, "b": 32,
        "epochs": 1, "MC_iters": 2, "learning_rate": 3e-4,
        "optimizer_name": "Adam", "dropout_rate": 0.2, "init_size": 4,
        "seed": 7,
        "consistency_coeff": 0.5, "consistency_ramp": 8,
        "consistency_measure": "MSE", "ema_decay": 0.9,
        "unlabeled_batch": 16,
    }
    pars.update(over)
    return ExperimentConfig.from_pars(pars)


def _run(root, vols, mask, n, **over):
    from nnal_tpu.engine.pw_experiment import PWExperiment

    expr = PWExperiment(str(root), _cfg(**over))
    expr.attach_subject(vols, mask)
    expr.prep_data()
    expr.add_method("entropy")
    res = expr.run_method("entropy", n)
    return expr, res


def test_mt_ssl_trains_and_checkpoints_teacher(tmp_path):
    vols, mask = synthetic_subject(shape=(24, 24, 8), n_modalities=1,
                                   seed=0)
    _, res = _run(tmp_path / "mt", vols, mask, 6)
    assert res["n_queries"] == 6
    assert np.isfinite(res["perf"]).all()

    params, _, teacher, _ = load_checkpoint(
        str(tmp_path / "mt" / "entropy" / "curr_weights.npz"))
    assert teacher is not None, "EMA teacher missing from the resume point"
    # the teacher must lag the student (EMA), not equal it
    import jax

    diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
             for a, b in zip(jax.tree_util.tree_leaves(params),
                             jax.tree_util.tree_leaves(teacher))]
    assert max(diffs) > 0

    # the consistency term must flow: same seed without MT ends elsewhere
    _, res0 = _run(tmp_path / "nomt", vols, mask, 6, consistency_coeff=0.0)
    p0 = load_checkpoint(
        str(tmp_path / "nomt" / "entropy" / "curr_weights.npz"))[0]
    d = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
         for a, b in zip(jax.tree_util.tree_leaves(params),
                         jax.tree_util.tree_leaves(p0))]
    assert max(d) > 0, "consistency_coeff had no effect on training"


def test_mt_ssl_crash_resume_bit_identical(tmp_path):
    from test_ckpt_every import (
        _SuppressResume,
        _artifacts,
        _assert_identical,
    )
    import nnal_tpu.engine.pw_experiment as pw_mod

    vols, mask = synthetic_subject(shape=(24, 24, 8), n_modalities=1,
                                   seed=0)
    over = dict(ckpt_full_every=2)

    _, res = _run(tmp_path / "a", vols, mask, 12, **over)
    assert res["n_queries"] == 12
    ref = _artifacts(str(tmp_path / "a"), "entropy")

    from nnal_tpu.engine.pw_experiment import PWExperiment

    expr = PWExperiment(str(tmp_path / "b"), _cfg(**over))
    expr.attach_subject(vols, mask)
    expr.prep_data()
    expr.add_method("entropy")
    with _SuppressResume(pw_mod) as sup:
        expr.run_method("entropy", 6)
    assert sup.suppressed >= 1
    expr2 = PWExperiment(str(tmp_path / "b"), _cfg(**over))
    expr2.attach_subject(vols, mask)
    res2 = expr2.run_method("entropy", 12)
    assert res2["n_queries"] == 12
    _assert_identical(ref, _artifacts(str(tmp_path / "b"), "entropy"))
    # the replayed teacher matches too
    ta = load_checkpoint(
        str(tmp_path / "a" / "entropy" / "curr_weights.npz"))[2]
    tb = load_checkpoint(
        str(tmp_path / "b" / "entropy" / "curr_weights.npz"))[2]
    import jax

    for x, y in zip(jax.tree_util.tree_leaves(ta),
                    jax.tree_util.tree_leaves(tb)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_mt_rampdown_factors():
    """engine.common.mt_rampdown: reference exp(-12.5 phase^2) shape on
    the labeled count; hard OFF at/above the threshold (cc -> 0 routes
    the engines to the plain runner)."""
    from nnal_tpu.engine.common import mt_rampdown

    class M:
        consistency_coeff = 0.5
        consistency_off_labels = 100

    cc, s0 = mt_rampdown(M, 0)
    assert cc == 0.5 and s0 == 1.0
    # full strength through the first half-window
    assert mt_rampdown(M, 50)[1] == 1.0
    # reference exp(-12.5 phase^2) decay over the second half
    _, s_75 = mt_rampdown(M, 75)
    assert np.isclose(s_75, np.exp(-12.5 * 0.25))
    cc_off, s_off = mt_rampdown(M, 100)
    assert cc_off == 0.0 and s_off == 0.0
    # factors are monotone non-increasing in n_labeled
    factors = [mt_rampdown(M, n)[1] for n in range(0, 101, 10)]
    assert all(a >= b for a, b in zip(factors, factors[1:]))
    # disabled: scale pinned to 1
    M.consistency_off_labels = 0
    assert mt_rampdown(M, 10 ** 6) == (0.5, 1.0)


def test_mt_rampdown_end_to_end_and_off_matches_plain(tmp_path):
    """With consistency_off_labels <= init_size the MT campaign must make
    the SAME queries/evals as a plain campaign (cc fully off from round
    one; only the never-consulted teacher group differs), and a mid-curve
    threshold must still train/replay cleanly."""
    vols, mask = synthetic_subject(shape=(24, 24, 8), n_modalities=1,
                                   seed=0)
    # threshold below the initial labeled count -> MT off everywhere
    _, res_off = _run(tmp_path / "off", vols, mask, 6,
                      consistency_off_labels=4)
    _, res_plain = _run(tmp_path / "plain", vols, mask, 6,
                        consistency_coeff=0.0)
    qa = sorted(os.listdir(tmp_path / "off" / "entropy" / "queries"))
    qb = sorted(os.listdir(tmp_path / "plain" / "entropy" / "queries"))
    assert qa == qb
    for f in qa:
        np.testing.assert_array_equal(
            np.loadtxt(tmp_path / "off" / "entropy" / "queries" / f),
            np.loadtxt(tmp_path / "plain" / "entropy" / "queries" / f))
    np.testing.assert_array_equal(res_off["perf"], res_plain["perf"])

    # mid-curve threshold: crosses from ramped MT to off during the run
    _, res_mid = _run(tmp_path / "mid", vols, mask, 9,
                      consistency_off_labels=8)
    assert res_mid["n_queries"] == 9
    assert np.isfinite(res_mid["perf"]).all()


def test_mt_start_labels():
    """consistency_start_labels: MT fully off below the threshold (the
    round-0-dip counter-lever), composing with the off ramp."""
    from nnal_tpu.engine.common import mt_rampdown

    class M:
        consistency_coeff = 0.5
        consistency_start_labels = 16
        consistency_off_labels = 100

    assert mt_rampdown(M, 8) == (0.0, 0.0)    # before start
    assert mt_rampdown(M, 16) == (0.5, 1.0)   # at start: full strength
    assert mt_rampdown(M, 100) == (0.0, 0.0)  # off threshold still wins
    M.consistency_off_labels = 0
    assert mt_rampdown(M, 8) == (0.0, 0.0)
    assert mt_rampdown(M, 200) == (0.5, 1.0)


def test_mt_start_labels_end_to_end(tmp_path):
    """A campaign whose start threshold is above the whole-run labeled
    count must make exactly the plain campaign's queries/evals."""
    vols, mask = synthetic_subject(shape=(24, 24, 8), n_modalities=1,
                                   seed=0)
    _, res_start = _run(tmp_path / "start", vols, mask, 6,
                        consistency_start_labels=1000)
    _, res_plain = _run(tmp_path / "plain", vols, mask, 6,
                        consistency_coeff=0.0)
    np.testing.assert_array_equal(res_start["perf"], res_plain["perf"])
