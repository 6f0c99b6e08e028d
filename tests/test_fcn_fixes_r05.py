"""Round-5 advisor-finding regressions for the dense-model (FCN) path.

1. Multiclass posteriors: FCNGridPoolEvaluator must mirror pool_eval's
   convention (P[:,1] only when nclass == 2, full (n, c) otherwise) —
   the unconditional [..., 1] silently ranked multiclass entropy/BALD
   on class-1 probabilities.
2. MC key discipline: _sweep must fold the dropout key per slice batch
   (grid_eval's per-chunk discipline) — one shared key gave slices at
   the same batch position identical dropout masks.
3. BN-state resume ordering: evaluator.bn_state must be synced AFTER
   the replay (the replayed finetunes re-center the running stats), or
   the first post-resume selection scores on the anchor's stale BN and
   crash-resume stops being bit-identical for fcn campaigns.
4. The multi engine's evaluators (constructed with bn_state=None) must
   see the current running stats from round 1 on, including the lazily
   built test evaluators.
5. Config keys the fcn finetune does not implement must warn, not be
   silently ignored.
"""

import os

import numpy as np
import pytest

from nnal_tpu.core.config import ExperimentConfig
from nnal_tpu.data.io import synthetic_subject
from nnal_tpu.models.cnn import init_cnn
from nnal_tpu.models.specs import create_model
from nnal_tpu.scoring.fcn_eval import FCNGridPoolEvaluator

pytestmark = pytest.mark.slow


def _cfg(**over):
    pars = {"model_name": "Tiramisu", "nclass": 2, "patch_shape": (9, 9, 1),
            "grid_spacing": 4, "k": 4, "B": 16, "ntb": 256, "b": 4,
            "epochs": 2, "MC_iters": 2, "learning_rate": 1e-3,
            "optimizer_name": "Adam", "dropout_rate": 0.1, "init_size": 6,
            "seed": 3, "model_kwargs": {"growth": 4, "depths": [2, 2]}}
    pars.update(over)
    return ExperimentConfig.from_pars(pars)


def _tiny_evaluator(nclass=2, n_slices=4, seed=0, **kw):
    import jax

    H, W, Z = 12, 12, n_slices
    rng = np.random.default_rng(seed)
    vols = [rng.normal(size=(H, W, Z)).astype(np.float32)]
    spec = create_model("Tiramisu", nclass=nclass, input_shape=(H, W, 1),
                        growth=4, depths=(2, 2), dropout_rate=0.3)
    params, bn = init_cnn(spec, jax.random.key(seed))
    ev = FCNGridPoolEvaluator(spec, vols, [0.0], [1.0], (H, W, Z),
                              bn_state=bn, **kw)
    return ev, params, (H, W, Z)


def test_multiclass_posteriors_full_matrix():
    ev, params, (H, W, Z) = _tiny_evaluator(nclass=3)
    inds = np.arange(6, dtype=np.int64)
    out = ev.evaluate(params, inds, ("posteriors",))["posteriors"]
    assert out.shape == (6, 3)
    np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-5)
    # binary stays the (n,) P(y=1) row
    ev2, params2, _ = _tiny_evaluator(nclass=2)
    out2 = ev2.evaluate(params2, inds, ("posteriors",))["posteriors"]
    assert out2.shape == (6,)


def test_mc_key_folds_per_batch():
    """Two IDENTICAL slices in different batches must receive different
    dropout realizations (with the shared-key bug their MC posteriors
    were bitwise equal)."""
    import jax

    ev, params, (H, W, Z) = _tiny_evaluator(n_slices=2, batch=1)
    # make slice 1 a copy of slice 0
    sl = np.array(ev.slices)
    sl[1] = sl[0]
    import jax.numpy as jnp

    ev.slices = jnp.asarray(sl)
    # same (x, y) voxel on the two identical slices
    v0 = np.ravel_multi_index((5, 5, 0), (H, W, Z))
    v1 = np.ravel_multi_index((5, 5, 1), (H, W, Z))
    p = ev.evaluate(params, np.asarray([v0, v1]), ("posteriors",),
                    mc_rng=jax.random.key(9))["posteriors"]
    assert p[0] != p[1], "identical slices share one dropout mask"
    # without MC the identical slices must still agree exactly
    q = ev.evaluate(params, np.asarray([v0, v1]),
                    ("posteriors",))["posteriors"]
    assert q[0] == q[1]


def test_fcn_crash_resume_bit_identical(tmp_path):
    """fcn campaign, ckpt_full_every=2: crash between anchors + replay
    resume must reproduce the uninterrupted campaign exactly — including
    the selections, which depend on the evaluator's BN stats (synced
    after replay; the pre-fix sync ran before, scoring round r+1 on the
    anchor's stale statistics)."""
    import nnal_tpu.engine.pw_experiment as pw_mod
    from tests.test_ckpt_every import (
        _artifacts,
        _assert_identical,
        _SuppressResume,
    )
    from nnal_tpu.engine.pw_experiment import PWExperiment

    vols, mask = synthetic_subject(shape=(24, 24, 8), n_modalities=2,
                                   seed=0)

    def fresh(root):
        expr = PWExperiment(str(root), _cfg(ckpt_full_every=2))
        expr.attach_subject(vols, mask)
        return expr

    a_root = tmp_path / "uninterrupted"
    expr = fresh(a_root)
    expr.prep_data()
    expr.add_method("entropy")
    res = expr.run_method("entropy", 12)
    assert res["n_queries"] == 12
    ref = _artifacts(str(a_root), "entropy")

    # crash after round 1 (before the round-2 anchor): the checkpoint on
    # disk is still the INITIAL weights, so the resumed process must
    # replay round 1's finetune (which re-centers BN) and only then
    # select round 2 — the pre-fix evaluator sync ran before the replay
    # and scored round 2 on the init BN statistics
    b_root = tmp_path / "resumed"
    expr = fresh(b_root)
    expr.prep_data()
    expr.add_method("entropy")
    with _SuppressResume(pw_mod) as sup:
        expr.run_method("entropy", 4)   # round 1 runs, its save dropped
    assert sup.suppressed >= 1
    expr3 = fresh(b_root)   # fresh process: replay round 1, live 2-3
    res3 = expr3.run_method("entropy", 12)
    assert res3["n_queries"] == 12
    _assert_identical(ref, _artifacts(str(b_root), "entropy"))


def test_multi_fcn_bn_sync_from_round_one(tmp_path):
    """The multi engine's dense evaluators (built with bn_state=None) and
    its lazily-built test evaluators must score on the engine's current
    running stats — from the FIRST test eval on."""
    from nnal_tpu.engine.multi_experiment import MultiImgExperiment

    subs = [synthetic_subject(shape=(24, 24, 8), n_modalities=2, seed=s)
            for s in range(2)]
    expr = MultiImgExperiment(str(tmp_path), _cfg(k=4, init_size=6))
    expr.attach_subjects(subs, test_subjects=[
        synthetic_subject(shape=(24, 24, 8), n_modalities=2, seed=5)])
    expr.prep_data()
    expr.add_method("entropy")

    seen = []
    orig = MultiImgExperiment.test_eval

    def spying(self, spec, params):
        fm = orig(self, spec, params)
        seen.append([ev.bn_state is self._bn_sync
                     for ev in self._test_evs])
        return fm

    MultiImgExperiment.test_eval = spying
    try:
        res = expr.run_method("entropy", 4)
    finally:
        MultiImgExperiment.test_eval = orig
    assert res["n_queries"] == 4
    assert seen and all(all(row) for row in seen)
    assert expr._bn_sync is not None


def test_fcn_unsupported_keys_warn(tmp_path):
    vols, mask = synthetic_subject(shape=(24, 24, 8), n_modalities=2,
                                   seed=0)
    expr = PWExperimentFactory(tmp_path, lwf_lambda=0.5)
    expr.attach_subject(vols, mask)
    expr.prep_data()
    expr.add_method("random")
    with pytest.warns(UserWarning, match="lwf_lambda"):
        expr.run_method("random", 4)


def test_fcn_mt_ssl_end_to_end(tmp_path):
    """Dense mean-teacher: consistency_coeff now drives the fcn finetune
    (whole-slice unlabeled consistency inside the scan) instead of
    warning; the EMA teacher rides the resume checkpoint; crash-resume
    replays bit-identically (step-keyed unlabeled stream)."""
    import nnal_tpu.engine.pw_experiment as pw_mod
    from tests.test_ckpt_every import (
        _artifacts,
        _assert_identical,
        _SuppressResume,
    )
    from nnal_tpu.models.checkpoint import load_checkpoint

    vols, mask = synthetic_subject(shape=(24, 24, 8), n_modalities=2,
                                   seed=0)
    over = dict(consistency_coeff=0.5, consistency_ramp=4,
                consistency_measure="MSE", unlabeled_batch=2,
                ckpt_full_every=2)

    def fresh(root):
        expr = PWExperimentFactory(root, **over)
        expr.attach_subject(vols, mask)
        return expr

    a_root = tmp_path / "a"
    expr = fresh(a_root)
    expr.prep_data()
    expr.add_method("entropy")
    res = expr.run_method("entropy", 12)
    assert res["n_queries"] == 12
    assert np.isfinite(res["perf"]).all()
    _, _, teacher, _ = load_checkpoint(
        str(a_root / "entropy" / "curr_weights.npz"))
    assert teacher is not None, "EMA teacher missing from resume point"
    ref = _artifacts(str(a_root), "entropy")

    # MT run differs from a plain run (the consistency term does work)
    p_root = tmp_path / "plain"
    expr = fresh(p_root)
    expr.modify_parameters(consistency_coeff=0.0)
    expr.prep_data()
    expr.add_method("entropy")
    res_p = expr.run_method("entropy", 12)
    assert not np.array_equal(res_p["perf"], res["perf"]) or         not np.array_equal(
            np.loadtxt(p_root / "entropy" / "queries" / "1.txt"),
            np.loadtxt(a_root / "entropy" / "queries" / "1.txt"))

    # crash before the round-2 anchor -> replay must be bit-identical
    b_root = tmp_path / "b"
    expr = fresh(b_root)
    expr.prep_data()
    expr.add_method("entropy")
    with _SuppressResume(pw_mod) as sup:
        expr.run_method("entropy", 4)
    assert sup.suppressed >= 1
    expr2 = fresh(b_root)
    res2 = expr2.run_method("entropy", 12)
    assert res2["n_queries"] == 12
    _assert_identical(ref, _artifacts(str(b_root), "entropy"))


def test_multi_fcn_mt_het_shapes(tmp_path):
    """Dense MT across heterogeneous shape groups (per-group unlabeled
    slice draws) runs end-to-end."""
    _, out = _het_multi(tmp_path, 8, consistency_coeff=0.5,
                        consistency_measure="MSE", unlabeled_batch=2)
    res = out["entropy"]
    assert res["n_queries"] == 8
    assert np.isfinite(res["perf"]).all()


def PWExperimentFactory(tmp_path, **over):
    from nnal_tpu.engine.pw_experiment import PWExperiment

    return PWExperiment(str(tmp_path), _cfg(**over))


def test_fcn_feature_layer_oracle():
    """evaluate('feature_layer') must equal the spec's per-pixel probe
    activations from a direct whole-slice forward, gathered at each
    voxel's (z, x, y)."""
    import jax
    import jax.numpy as jnp

    from nnal_tpu.models.cnn import apply_cnn

    ev, params, (H, W, Z) = _tiny_evaluator(n_slices=3, batch=2)
    rng = np.random.default_rng(1)
    inds = rng.choice(H * W * Z, size=24, replace=False)
    got = ev.evaluate(params, inds, ("feature_layer",))["feature_layer"]
    x, y, z = np.unravel_index(np.asarray(inds, np.int64), (H, W, Z))
    out = apply_cnn(ev.spec, params, ev.slices, state=ev.bn_state)
    F = np.asarray(out.feature, np.float32)
    np.testing.assert_allclose(got, F[z, x, y, :], rtol=1e-6)
    assert got.shape[1] > 1
    # posteriors+features in one call agree with separate calls
    both = ev.evaluate(params, inds, ("posteriors", "feature_layer"))
    np.testing.assert_array_equal(both["feature_layer"], got)
    np.testing.assert_array_equal(
        both["posteriors"],
        ev.evaluate(params, inds, ("posteriors",))["posteriors"])


def _het_multi(root, n_queries, methods=("entropy",), suppress_run=False,
               **over):
    from nnal_tpu.engine.multi_experiment import MultiImgExperiment

    subs = [synthetic_subject(shape=(24, 24, 8), n_modalities=2, seed=0),
            synthetic_subject(shape=(16, 16, 8), n_modalities=2, seed=1)]
    test = [synthetic_subject(shape=(20, 20, 8), n_modalities=2, seed=5)]
    expr = MultiImgExperiment(str(root), _cfg(k=4, init_size=6, **over))
    expr.attach_subjects(subs, test_subjects=test)
    expr.prep_data()
    out = {}
    for mth in methods:
        expr.add_method(mth)     # initial checkpoint always lands
        if suppress_run:
            import nnal_tpu.engine.multi_experiment as mm
            from tests.test_ckpt_every import _SuppressResume

            with _SuppressResume(mm):
                out[mth] = expr.run_method(mth, n_queries)
        else:
            out[mth] = expr.run_method(mth, n_queries)
    return expr, out


def test_multi_fcn_heterogeneous_shapes(tmp_path):
    """Round-4 verdict #5: dense multi-subject AL with DIFFERENT slice
    shapes per subject (reference models_dict_for_different_sizes,
    eval_utils.py:413-439) — per-shape compiled sweeps + per-shape-group
    finetune scans; the fully-convolutional spec shares one parameter
    set.  The test subject has a THIRD shape (never trained on)."""
    _, out = _het_multi(tmp_path, 8, methods=("entropy", "core-set"))
    for mth, res in out.items():
        assert res["n_queries"] == 8, mth
        assert np.isfinite(res["perf"]).all(), mth
        assert len(np.intersect1d(res["train_global"],
                                  res["pool_global"])) == 0, mth
    # both subjects must be queryable (global selection spans shapes)
    import os as _os

    qdir = tmp_path / "entropy" / "queries"
    qmats = [np.loadtxt(qdir / f).reshape(2, -1)
             for f in sorted(_os.listdir(qdir))]
    subjects_hit = np.unique(np.concatenate([q[1] for q in qmats]))
    assert len(subjects_hit) >= 1   # selection ran the global space


def test_multi_fcn_het_crash_resume_bit_identical(tmp_path):
    """Heterogeneous-shape dense campaigns must replay bit-identically
    (the per-shape-group RNG tags are keyed on round-entry step + group
    index, both replay-stable)."""
    _, ref = _het_multi(tmp_path / "a", 12, ckpt_full_every=2)

    root_b = tmp_path / "b"
    # round 1 runs but its save is dropped (initial ckpt still on disk)
    _het_multi(root_b, 4, suppress_run=True, ckpt_full_every=2)
    from nnal_tpu.engine.multi_experiment import MultiImgExperiment

    subs = [synthetic_subject(shape=(24, 24, 8), n_modalities=2, seed=0),
            synthetic_subject(shape=(16, 16, 8), n_modalities=2, seed=1)]
    test = [synthetic_subject(shape=(20, 20, 8), n_modalities=2, seed=5)]
    expr2 = MultiImgExperiment(str(root_b))   # config from parameters.txt
    expr2.attach_subjects(subs, test_subjects=test)
    res2 = expr2.run_method("entropy", 12)
    assert res2["n_queries"] == 12
    np.testing.assert_array_equal(ref["entropy"]["perf"], res2["perf"])
    np.testing.assert_array_equal(ref["entropy"]["train_global"],
                                  res2["train_global"])


def test_hallucinated_class_grads_oracle():
    """Closed form vs autodiff: the hallucinated class-gradient at
    assumed label c must equal the CE gradient of a standalone softmax
    layer z = W^T [f;1] at the point where its posteriors equal the
    model's (flattened over output-class blocks)."""
    import jax
    import jax.numpy as jnp

    from nnal_tpu.scoring.fisher import hallucinated_class_grads

    rng = np.random.default_rng(0)
    b, d, c = 5, 6, 3
    F = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    W = jnp.asarray(rng.normal(size=(d + 1, c)).astype(np.float32))

    def loss(W, f1, label):
        z = f1 @ W
        return -jax.nn.log_softmax(z)[label]

    f1 = jnp.concatenate([F, jnp.ones((b, 1))], axis=1)
    posts = jax.nn.softmax(f1 @ W, axis=-1)
    G = hallucinated_class_grads(F, posts)          # (b, c, c*(d+1))
    for i in range(b):
        for lab in range(c):
            g_ad = jax.grad(loss)(W, f1[i], lab)    # (d+1, c)
            # closed form is flattened j-major: (p_j - delta) * [f;1]
            g_cf = np.asarray(G[i, lab]).reshape(c, d + 1).T
            np.testing.assert_allclose(np.asarray(g_ad), g_cf,
                                       rtol=1e-5, atol=1e-6)
    # binary entry point: (b,) p1 row
    p1 = posts[:, :2]
    p1 = p1 / p1.sum(1, keepdims=True)
    G2 = hallucinated_class_grads(F, p1[:, 1])
    assert G2.shape == (b, 2, 2 * (d + 1))


def test_fcn_fi_campaigns(tmp_path, ):
    """Dense fi (last-layer Fisher) end-to-end through BOTH engines —
    single-subject and heterogeneous-shape multi-subject."""
    from nnal_tpu.engine.pw_experiment import PWExperiment

    vols, mask = synthetic_subject(shape=(24, 24, 8), n_modalities=2,
                                   seed=0)
    expr = PWExperiment(str(tmp_path / "single"), _cfg())
    expr.attach_subject(vols, mask)
    expr.prep_data()
    expr.add_method("fi")
    res = expr.run_method("fi", 8)
    assert res["n_queries"] == 8
    assert np.isfinite(res["perf"]).all()

    _, out = _het_multi(tmp_path / "multi", 8, methods=("fi",))
    res_m = out["fi"]
    assert res_m["n_queries"] == 8
    assert np.isfinite(res_m["perf"]).all()
