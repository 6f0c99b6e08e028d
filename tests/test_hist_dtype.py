"""hist_dtype: float16 per-iteration history checkpoints (multi engine).

The per-iter ``curr_weights_<i>.npz`` copies are analysis-only artifacts
(reference ``curr_weights_%d.h5``, PW_AL.py:895-898); storing them in
float16 halves the device->host pull that dominates tunneled campaigns.
Resume points must stay full precision so anchored replay stays
bit-identical.
"""

import os

import numpy as np

from nnal_tpu.core.config import ExperimentConfig
from nnal_tpu.core.journal import MethodJournal
from nnal_tpu.data.io import synthetic_subject
from nnal_tpu.engine.multi_experiment import MultiImgExperiment
from nnal_tpu.models.checkpoint import load_checkpoint


def _pars(**kw):
    base = {"model_name": "PW", "nclass": 2, "patch_shape": (9, 9, 1),
            "grid_spacing": 6, "k": 3, "B": 12, "ntb": 128, "b": 16,
            "epochs": 2, "learning_rate": 1e-3, "optimizer_name": "Adam",
            "init_size": 4}
    base.update(kw)
    return base


def test_hist_dtype_f16_halves_history_not_resume(tmp_path):
    root = str(tmp_path / "e")
    cfg = ExperimentConfig.from_pars(
        _pars(hist_dtype="float16", ckpt_full_every=4))
    subs = [synthetic_subject(shape=(20, 20, 6), n_modalities=1, seed=s)
            for s in range(2)]
    expr = MultiImgExperiment(root, cfg)
    expr.attach_subjects(subs)
    expr.prep_data()
    expr.add_method("random")
    expr.run_method("random", 6)
    j = MethodJournal(root, "random")

    # per-iter history copies (non-anchor rounds) are float16
    hist = load_checkpoint(j.path("curr_weights_1.npz"))[0]
    leaves = [np.asarray(v) for v in
              __import__("jax").tree_util.tree_leaves(hist)]
    float_leaves = [v for v in leaves if np.issubdtype(v.dtype, np.floating)]
    assert float_leaves and all(v.dtype == np.float16 for v in float_leaves)

    # the resume point stays full precision (completed runs always end
    # with a full f32 save)
    params, _, _, al_state = load_checkpoint(j.path("curr_weights.npz"))
    rleaves = [np.asarray(v) for v in
               __import__("jax").tree_util.tree_leaves(params)
               if np.issubdtype(np.asarray(v).dtype, np.floating)]
    assert rleaves and all(v.dtype == np.float32 for v in rleaves)

    # f16 history is genuinely smaller on disk than the f32 resume params
    h_bytes = os.path.getsize(j.path("curr_weights_1.npz"))
    f_bytes = os.path.getsize(j.path("curr_weights.npz"))
    assert h_bytes < 0.62 * f_bytes

    # resume continues from the journal with no precision complaints
    expr2 = MultiImgExperiment(root)
    expr2.attach_subjects(subs)
    res = expr2.run_method("random", 9)
    assert res["n_queries"] == 9


def test_hist_dtype_f16_on_anchor_rounds_too(tmp_path):
    """With ckpt_full_every=1 every round is an anchor; the history copy
    must still honor hist_dtype (pulled separately from the f32 resume
    point) — a run with only anchors may not silently fall back to f32
    history files."""
    import jax

    root = str(tmp_path / "e")
    cfg = ExperimentConfig.from_pars(_pars(hist_dtype="float16"))
    subs = [synthetic_subject(shape=(20, 20, 6), n_modalities=1, seed=s)
            for s in range(2)]
    expr = MultiImgExperiment(root, cfg)
    expr.attach_subjects(subs)
    expr.prep_data()
    expr.add_method("random")
    expr.run_method("random", 6)
    j = MethodJournal(root, "random")

    for i in (1, 2):
        hist = load_checkpoint(j.path(f"curr_weights_{i}.npz"))[0]
        fl = [np.asarray(v) for v in jax.tree_util.tree_leaves(hist)
              if np.issubdtype(np.asarray(v).dtype, np.floating)]
        assert fl and all(v.dtype == np.float16 for v in fl)

    params = load_checkpoint(j.path("curr_weights.npz"))[0]
    rl = [np.asarray(v) for v in jax.tree_util.tree_leaves(params)
          if np.issubdtype(np.asarray(v).dtype, np.floating)]
    assert rl and all(v.dtype == np.float32 for v in rl)


def test_hist_dtype_matches_f32_training_exactly(tmp_path):
    """hist_dtype only changes the STORED history copies — the training
    trajectory (and thus the resume point) must be bit-identical to a
    float32-history run."""
    import jax

    def run(hd, root):
        cfg = ExperimentConfig.from_pars(
            _pars(hist_dtype=hd, ckpt_full_every=2))
        subs = [synthetic_subject(shape=(20, 20, 6), n_modalities=1,
                                  seed=s) for s in range(2)]
        expr = MultiImgExperiment(root, cfg)
        expr.attach_subjects(subs)
        expr.prep_data()
        expr.add_method("random")
        expr.run_method("random", 6)
        return load_checkpoint(
            os.path.join(root, "random", "curr_weights.npz"))[0]

    p32 = run("float32", str(tmp_path / "a"))
    p16 = run("float16", str(tmp_path / "b"))
    for a, b in zip(jax.tree_util.tree_leaves(p32),
                    jax.tree_util.tree_leaves(p16)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hist_every_zero_writes_no_history(tmp_path):
    """hist_every=0 disables the analysis-only per-iter history copies
    entirely — with anchored checkpoints non-anchor rounds then transfer
    zero checkpoint bytes — without touching training or resume."""
    import jax

    subs = [synthetic_subject(shape=(20, 20, 6), n_modalities=1, seed=s)
            for s in range(2)]

    def run(root, **kw):
        cfg = ExperimentConfig.from_pars(_pars(ckpt_full_every=3, **kw))
        expr = MultiImgExperiment(root, cfg)
        expr.attach_subjects(subs)
        expr.prep_data()
        expr.add_method("random")
        expr.run_method("random", 6)
        return MethodJournal(root, "random")

    j0 = run(str(tmp_path / "he0"), hist_every=0)
    jd = run(str(tmp_path / "he1"))

    # no per-iter history files, but the default run has them
    assert not [f for f in os.listdir(j0.path(""))
                if f.startswith("curr_weights_")]
    assert [f for f in os.listdir(jd.path(""))
            if f.startswith("curr_weights_")]

    # the resume point still lands and the trajectory is unchanged
    p0 = load_checkpoint(j0.path("curr_weights.npz"))[0]
    pd = load_checkpoint(jd.path("curr_weights.npz"))[0]
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(pd)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # journal resume continues cleanly with no history files present
    expr2 = MultiImgExperiment(str(tmp_path / "he0"))
    expr2.attach_subjects(subs)
    res = expr2.run_method("random", 9)
    assert res["n_queries"] == 9


def test_hist_every_k_writes_every_kth_round(tmp_path):
    cfg = ExperimentConfig.from_pars(_pars(hist_every=2, ckpt_full_every=4))
    subs = [synthetic_subject(shape=(20, 20, 6), n_modalities=1, seed=s)
            for s in range(2)]
    expr = MultiImgExperiment(str(tmp_path / "e"), cfg)
    expr.attach_subjects(subs)
    expr.prep_data()
    expr.add_method("random")
    expr.run_method("random", 9)       # rounds 1..3 at k=3
    j = MethodJournal(str(tmp_path / "e"), "random")
    hist = sorted(f for f in os.listdir(j.path(""))
                  if f.startswith("curr_weights_"))
    assert hist == ["curr_weights_2.npz"]
