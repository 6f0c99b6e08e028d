"""ckpt_full_every: anchored checkpoints + bit-identical replay resume.

With ``ckpt_full_every = K > 1`` the engines write the full (params +
optimizer moments) resume point only every K rounds — on the tunneled TPU
that pull is the dominant per-round cost (~21 s for the ~0.5 GB PW1+Adam
payload, benchmarks/CAMPAIGNS_r03.json) — and a crash between anchors
resumes by replaying the journaled rounds' finetunes from the anchor
(step-keyed RNG, prefix train sets), which must be bit-identical to an
uninterrupted campaign (reference resume mechanism, PW_AL.py:722-734).

The crash is simulated by suppressing ``curr_weights.npz`` writes during
the first partial run: on-disk state is then exactly what a SIGKILL after
the last round's ``state.json`` write would leave (journal ahead of the
anchor checkpoint).
"""

import os

import numpy as np
import pytest

from nnal_tpu.core.config import ExperimentConfig
from nnal_tpu.data.io import synthetic_subject
from nnal_tpu.models.checkpoint import load_checkpoint

pytestmark = pytest.mark.slow


def _pw_cfg(**over):
    pars = {
        "model_name": "PW", "nclass": 2, "patch_shape": (9, 9, 1),
        "grid_spacing": 5, "k": 3, "B": 16, "ntb": 256, "b": 32,
        "epochs": 1, "MC_iters": 2, "learning_rate": 3e-4,
        "optimizer_name": "Adam", "dropout_rate": 0.2, "init_size": 4,
        "seed": 7,
    }
    pars.update(over)
    return ExperimentConfig.from_pars(pars)


def _artifacts(root, method):
    mdir = os.path.join(root, method)
    qdir = os.path.join(mdir, "queries")
    queries = {f: np.loadtxt(os.path.join(qdir, f))
               for f in sorted(os.listdir(qdir))}
    with open(os.path.join(mdir, "perf_evals.txt")) as f:
        evals = f.read()
    params, _, _, al_state = load_checkpoint(
        os.path.join(mdir, "curr_weights.npz"))
    return queries, evals, params, al_state


def _assert_identical(a, b):
    qa, ea, pa, _ = a
    qb, eb, pb, _ = b
    assert list(qa) == list(qb)
    for f in qa:
        np.testing.assert_array_equal(qa[f], qb[f], err_msg=f"queries {f}")
    assert ea == eb, "per-round evals differ after replay resume"
    import jax

    la = jax.tree_util.tree_leaves(pa)
    lb = jax.tree_util.tree_leaves(pb)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class _SuppressResume:
    """Drop ``curr_weights.npz`` writes (the resume point) while active —
    per-iter history copies and everything else still land."""

    def __init__(self, module):
        self.module = module
        self.orig = module.save_checkpoint
        self.suppressed = 0

    def __enter__(self):
        def patched(path, *a, **kw):
            if os.path.basename(path) == "curr_weights.npz":
                self.suppressed += 1
                return
            return self.orig(path, *a, **kw)

        self.module.save_checkpoint = patched
        return self

    def __exit__(self, *exc):
        self.module.save_checkpoint = self.orig


def test_single_engine_anchor_writes_and_replay_resume(tmp_path):
    import nnal_tpu.engine.pw_experiment as pw_mod
    from nnal_tpu.engine.pw_experiment import PWExperiment

    vols, mask = synthetic_subject(shape=(24, 24, 8), n_modalities=1,
                                   seed=0)

    def fresh(root):
        expr = PWExperiment(str(root), _pw_cfg(ckpt_full_every=3))
        expr.attach_subject(vols, mask)
        return expr

    # --- uninterrupted reference campaign: 4 rounds of k=3 ---
    a_root = tmp_path / "uninterrupted"
    expr = fresh(a_root)
    expr.prep_data()
    expr.add_method("random")
    writes = {"n": 0}
    orig = pw_mod.save_checkpoint

    def counting(path, *a, **kw):
        if os.path.basename(path) == "curr_weights.npz":
            writes["n"] += 1
        return orig(path, *a, **kw)

    pw_mod.save_checkpoint = counting
    try:
        res = expr.run_method("random", 12)
    finally:
        pw_mod.save_checkpoint = orig
    assert res["n_queries"] == 12
    # K=3 over 4 rounds: one anchor (round 3) + the loop-end full save —
    # NOT one per round
    assert writes["n"] == 2, writes
    ref = _artifacts(str(a_root), "random")
    assert ref[3] is not None and int(ref[3]["round"]) == 4

    # --- crash at round 2 (no anchor yet), then replay-resume to 12 ---
    b_root = tmp_path / "resumed"
    expr = fresh(b_root)
    expr.prep_data()
    expr.add_method("random")
    with _SuppressResume(pw_mod) as sup:
        expr.run_method("random", 6)
    assert sup.suppressed >= 1
    # post-crash state: journal is 2 rounds ahead of the (initial) ckpt
    _, _, _, al_state = load_checkpoint(
        str(b_root / "random" / "curr_weights.npz"))
    assert al_state is None

    expr2 = fresh(b_root)   # fresh instance, as after a process death
    res2 = expr2.run_method("random", 12)
    assert res2["n_queries"] == 12
    _assert_identical(ref, _artifacts(str(b_root), "random"))


def test_bf16_anchor_replay_resume_bit_identical(tmp_path):
    """ckpt_dtype=bfloat16 + opt_reset_per_round: the shrunken anchors
    (bf16 storage, no optimizer moments) must keep crash-resume
    bit-identical — the adoption step (engine.common.adopt_anchor_rounding)
    makes disk decode to exactly the live state at every full save."""
    import nnal_tpu.engine.pw_experiment as pw_mod
    from nnal_tpu.engine.pw_experiment import PWExperiment

    vols, mask = synthetic_subject(shape=(24, 24, 8), n_modalities=1,
                                   seed=0)
    over = dict(ckpt_full_every=3, ckpt_dtype="bfloat16",
                opt_reset_per_round=True)

    def fresh(root):
        expr = PWExperiment(str(root), _pw_cfg(**over))
        expr.attach_subject(vols, mask)
        return expr

    a_root = tmp_path / "uninterrupted"
    expr = fresh(a_root)
    expr.prep_data()
    expr.add_method("random")
    res = expr.run_method("random", 12)
    assert res["n_queries"] == 12
    ref = _artifacts(str(a_root), "random")

    # the anchor on disk is bf16-encoded and carries no moment leaves
    with np.load(str(a_root / "random" / "curr_weights.npz")) as z:
        assert any(k.endswith("@bf16") for k in z.files), z.files
        assert not any(k.startswith("opt/") for k in z.files), z.files

    # crash AFTER an anchor round whose save was lost (round 3: the live
    # process adopted the bf16 rounding but the write never landed) —
    # replay must re-apply that adoption or it diverges at bf16 ulp scale
    b_root = tmp_path / "resumed"
    expr = fresh(b_root)
    expr.prep_data()
    expr.add_method("random")
    with _SuppressResume(pw_mod) as sup:
        expr.run_method("random", 9)
    assert sup.suppressed >= 1
    expr2 = fresh(b_root)
    res2 = expr2.run_method("random", 12)
    assert res2["n_queries"] == 12
    _assert_identical(ref, _artifacts(str(b_root), "random"))


def test_int8_anchor_replay_resume_bit_identical(tmp_path):
    """ckpt_dtype=int8: the 4x-shrunken anchors (per-out-slice int8
    weights, bf16 everything else, no moments) keep crash-resume
    bit-identical via the same capture-originals -> adopt -> save-originals
    discipline (engine.common.adopt_anchor_rounding docstring)."""
    import nnal_tpu.engine.pw_experiment as pw_mod
    from nnal_tpu.engine.pw_experiment import PWExperiment

    vols, mask = synthetic_subject(shape=(24, 24, 8), n_modalities=1,
                                   seed=0)
    over = dict(ckpt_full_every=3, ckpt_dtype="int8",
                opt_reset_per_round=True)

    def fresh(root):
        expr = PWExperiment(str(root), _pw_cfg(**over))
        expr.attach_subject(vols, mask)
        return expr

    a_root = tmp_path / "uninterrupted"
    expr = fresh(a_root)
    expr.prep_data()
    expr.add_method("random")
    res = expr.run_method("random", 12)
    assert res["n_queries"] == 12
    ref = _artifacts(str(a_root), "random")
    with np.load(str(a_root / "random" / "curr_weights.npz")) as z:
        assert any(k.endswith("@i8") for k in z.files), z.files
        assert not any(k.startswith("opt/") for k in z.files), z.files

    # crash AFTER the round-3 anchor whose save was lost (the live
    # process adopted the int8 dequant but the write never landed)
    b_root = tmp_path / "resumed"
    expr = fresh(b_root)
    expr.prep_data()
    expr.add_method("random")
    with _SuppressResume(pw_mod) as sup:
        expr.run_method("random", 9)
    assert sup.suppressed >= 1
    expr2 = fresh(b_root)
    res2 = expr2.run_method("random", 12)
    assert res2["n_queries"] == 12
    _assert_identical(ref, _artifacts(str(b_root), "random"))


def test_bf16_anchor_multi_engine_replay_resume(tmp_path):
    import nnal_tpu.engine.multi_experiment as mm_mod
    from nnal_tpu.engine.multi_experiment import MultiImgExperiment

    subs = [synthetic_subject(shape=(20, 20, 6), n_modalities=1, seed=s)
            for s in range(2)]
    over = dict(ckpt_full_every=2, ckpt_dtype="bfloat16",
                opt_reset_per_round=True, hist_every=0)

    def fresh(root):
        expr = MultiImgExperiment(str(root), _pw_cfg(**over))
        expr.attach_subjects(subs)
        return expr

    a_root = tmp_path / "uninterrupted"
    expr = fresh(a_root)
    expr.prep_data()
    expr.add_method("random")
    res = expr.run_method("random", 9)
    assert res["n_queries"] == 9
    ref = _artifacts(str(a_root), "random")
    with np.load(str(a_root / "random" / "curr_weights.npz")) as z:
        assert any(k.endswith("@bf16") for k in z.files), z.files
        assert not any(k.startswith("opt/") for k in z.files), z.files

    b_root = tmp_path / "resumed"
    expr = fresh(b_root)
    expr.prep_data()
    expr.add_method("random")
    with _SuppressResume(mm_mod) as sup:
        expr.run_method("random", 6)
    assert sup.suppressed >= 1
    expr2 = fresh(b_root)
    res2 = expr2.run_method("random", 9)
    assert res2["n_queries"] == 9
    _assert_identical(ref, _artifacts(str(b_root), "random"))


def test_classification_engine_replay_resume(tmp_path):
    import nnal_tpu.engine.experiment as cls_mod
    from nnal_tpu.engine.experiment import Experiment

    rng = np.random.default_rng(0)
    X = rng.normal(size=(160, 8, 8, 1)).astype(np.float32)
    y = (X.mean(axis=(1, 2, 3)) > 0).astype(np.int64)
    X[y == 1] += 0.8
    cfg_pars = {
        "model_name": "PW", "nclass": 2, "patch_shape": (8, 8, 1),
        "k": 3, "B": 16, "ntb": 64, "b": 16, "epochs": 1,
        "learning_rate": 3e-4, "optimizer_name": "Adam",
        "dropout_rate": 0.2, "init_size": 8, "test_ratio": 0.25,
        "seed": 7, "ckpt_full_every": 3,
    }

    def fresh(root):
        expr = Experiment(str(root), ExperimentConfig.from_pars(cfg_pars))
        expr.attach_data(X, y)
        return expr

    a_root = tmp_path / "uninterrupted"
    expr = fresh(a_root)
    run = expr.add_run()
    expr.add_method("entropy", run)
    res = expr.run_method("entropy", run, 12)
    assert res["n_queries"] == 12

    b_root = tmp_path / "resumed"
    expr = fresh(b_root)
    run = expr.add_run()
    expr.add_method("entropy", run)
    with _SuppressResume(cls_mod) as sup:
        expr.run_method("entropy", run, 6)
    assert sup.suppressed >= 1
    expr2 = fresh(b_root)
    res2 = expr2.run_method("entropy", run, 12)
    assert res2["n_queries"] == 12

    for name in ("accs.txt", "predicts.txt"):
        ea = open(a_root / "0" / "entropy" / name).read()
        eb = open(b_root / "0" / "entropy" / name).read()
        assert ea == eb, f"{name} differs after replay resume"
    pa = load_checkpoint(str(a_root / "0" / "entropy"
                             / "curr_weights.npz"))[0]
    pb = load_checkpoint(str(b_root / "0" / "entropy"
                             / "curr_weights.npz"))[0]
    import jax

    for x_, y_ in zip(jax.tree_util.tree_leaves(pa),
                      jax.tree_util.tree_leaves(pb)):
        np.testing.assert_array_equal(np.asarray(x_), np.asarray(y_))


def test_multi_engine_replay_resume_keeps_history_copies(tmp_path):
    import nnal_tpu.engine.multi_experiment as mm_mod
    from nnal_tpu.engine.multi_experiment import MultiImgExperiment

    subs = [synthetic_subject(shape=(20, 20, 6), n_modalities=1, seed=s)
            for s in range(2)]

    def fresh(root):
        expr = MultiImgExperiment(str(root), _pw_cfg(ckpt_full_every=2))
        expr.attach_subjects(subs)
        return expr

    # --- uninterrupted reference campaign: 3 rounds of k=3 ---
    a_root = tmp_path / "uninterrupted"
    expr = fresh(a_root)
    expr.prep_data()
    expr.add_method("random")
    res = expr.run_method("random", 9)
    assert res["n_queries"] == 9
    ref = _artifacts(str(a_root), "random")

    # --- crash at round 2 (anchor) + one more journaled round? no:
    # crash after round 2 with the anchor SUPPRESSED too, so resume
    # replays both rounds from the initial weights ---
    b_root = tmp_path / "resumed"
    expr = fresh(b_root)
    expr.prep_data()
    expr.add_method("random")
    with _SuppressResume(mm_mod) as sup:
        expr.run_method("random", 6)
    assert sup.suppressed >= 1
    # the params-only per-iteration history copies still landed per round
    for rid in (1, 2):
        assert os.path.exists(
            str(b_root / "random" / f"curr_weights_{rid}.npz")), rid

    expr2 = fresh(b_root)
    res2 = expr2.run_method("random", 9)
    assert res2["n_queries"] == 9
    _assert_identical(ref, _artifacts(str(b_root), "random"))
    # non-anchor history copies must be params-only (no optimizer payload)
    import numpy as _np

    z = _np.load(str(b_root / "random" / "curr_weights_3.npz"))
    assert not any(k.startswith("opt/") for k in z.files), z.files
