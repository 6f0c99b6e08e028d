"""Classification-engine strategy-surface extras: core-set, ensemble,
QBC-JS, influence (the patch-wise strategies' multiclass forms — the
reference's cls dispatch, NNAL.py:188-525, never had them)."""

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.models.cnn import init_cnn
from nnal_tpu.models.specs import create_model
from nnal_tpu.scoring.cls_strategies import (
    ClsQueryContext,
    batched_forward,
    cls_query,
)


def _tiny_model(nclass=3, seed=0, dropout=0.0):
    spec = create_model("PW", nclass=nclass, dropout_rate=dropout,
                        patch_shape=(8, 8, 1))
    params, _ = init_cnn(spec, jax.random.key(seed))
    return spec, params


def _ctx(spec, params, X, k=3, seed=0, **kw):
    return ClsQueryContext(spec=spec, params=params, pool_x=X, k=k,
                           rng=np.random.default_rng(seed), **kw)


# ------------------------------------------------------------------ core-set
def _greedy_k_center_oracle(F_pool, F_lab, k):
    """Numpy transcription of the reference greedy k-center
    (PW_NNAL.py:416-447): sims start at max similarity to the labeled
    set; each step takes argmin, raises sims with the pick's row."""
    Fn = F_pool / np.linalg.norm(F_pool, axis=1, keepdims=True)
    if F_lab is not None and len(F_lab):
        Ln = F_lab / np.linalg.norm(F_lab, axis=1, keepdims=True)
        sims = (Fn @ Ln.T).max(axis=1)
    else:
        sims = np.full(len(Fn), -np.inf)
    chosen = []
    for _ in range(k):
        q = int(np.argmin(sims))
        sims = np.maximum(sims, Fn @ Fn[q])
        sims[q] = np.inf
        chosen.append(q)
    return chosen


def test_cls_core_set_matches_feature_oracle():
    spec, params = _tiny_model()
    rng = np.random.default_rng(3)
    X = rng.normal(size=(40, 8, 8, 1)).astype(np.float32)
    L = rng.normal(size=(6, 8, 8, 1)).astype(np.float32)
    lab_y = rng.integers(0, 3, size=6)
    ctx = _ctx(spec, params, X, k=5, labeled_x=L, labeled_y=lab_y)
    picks = cls_query(ctx, "core-set")

    F_pool = batched_forward(spec, params, X, 16,
                             ("feature_layer",))["feature_layer"]
    F_lab = batched_forward(spec, params, L, 16,
                            ("feature_layer",))["feature_layer"]
    oracle = _greedy_k_center_oracle(np.asarray(F_pool, np.float64),
                                     np.asarray(F_lab, np.float64), 5)
    assert picks.tolist() == oracle


def test_cls_core_set_no_labeled_fallback():
    """With an empty labeled set, sims start at -inf: the first pick is
    position 0 (argmin of an all -inf vector = first index) and all picks
    are distinct."""
    spec, params = _tiny_model()
    X = np.random.default_rng(4).normal(size=(20, 8, 8, 1)).astype(
        np.float32)
    picks = cls_query(_ctx(spec, params, X, k=4), "core-set")
    assert len(set(picks.tolist())) == 4


def test_cls_core_set_avoids_labeled_twin():
    """A pool point identical to a labeled point has similarity 1.0 to the
    labeled set — greedy k-center must not pick it first."""
    spec, params = _tiny_model()
    rng = np.random.default_rng(5)
    X = rng.normal(size=(15, 8, 8, 1)).astype(np.float32)
    L = X[7:8].copy()                      # labeled twin of pool point 7
    picks = cls_query(_ctx(spec, params, X, k=1, labeled_x=L,
                           labeled_y=np.zeros(1, np.int64)), "core-set")
    assert picks[0] != 7


# -------------------------------------------------------- ensemble / QBC-JS
def _committee(n=3, nclass=3):
    spec = create_model("PW", nclass=nclass, dropout_rate=0.0,
                        patch_shape=(8, 8, 1))
    return spec, [init_cnn(spec, jax.random.key(100 + i))[0]
                  for i in range(n)]


def test_cls_qbc_js_matches_decomposition_oracle():
    spec, members = _committee()
    X = np.random.default_rng(6).normal(size=(25, 8, 8, 1)).astype(
        np.float32)
    picks = cls_query(_ctx(spec, members[0], X, k=4,
                           committee_params=members), "QBC-JS")

    stack = np.stack([
        batched_forward(spec, p, X, 16)["posteriors"] for p in members
    ]).astype(np.float64)

    def ent(p):
        return -(p * np.log(np.maximum(p, 1e-12))).sum(-1)

    js = ent(stack.mean(0)) - ent(stack).mean(0)
    assert picks.tolist() == np.argsort(-js, kind="stable")[:4].tolist()


def test_cls_ensemble_is_entropy_of_average():
    spec, members = _committee()
    X = np.random.default_rng(7).normal(size=(25, 8, 8, 1)).astype(
        np.float32)
    picks = cls_query(_ctx(spec, members[0], X, k=4,
                           committee_params=members), "ensemble")

    stack = np.stack([
        batched_forward(spec, p, X, 16)["posteriors"] for p in members
    ]).astype(np.float64)
    avg = stack.mean(0)
    ent = -(avg * np.log(np.maximum(avg, 1e-12))).sum(-1)
    # rank parity with the plain mean (the running mean is numerically
    # close; rankings of a 25-point pool with random nets are separated)
    assert set(picks.tolist()) == set(
        np.argsort(-ent, kind="stable")[:4].tolist())


# ------------------------------------------------------------------ influence
def test_cls_influence_matches_manual_composition():
    """The strategy branch == s_test from the labeled set composed with
    the jvp influence sweep over the B most-uncertain candidates at their
    pseudo-labels (same rng draw consumed for the solver key)."""
    from nnal_tpu.data.batching import make_onehot
    from nnal_tpu.scoring.influence import influence_scores, s_test
    from nnal_tpu.scoring.uncertainty import uncertainty_filter

    spec, params = _tiny_model(nclass=2)
    rng = np.random.default_rng(8)
    X = rng.normal(size=(30, 8, 8, 1)).astype(np.float32)
    L = rng.normal(size=(7, 8, 8, 1)).astype(np.float32)
    ly = rng.integers(0, 2, size=7)
    picks = cls_query(_ctx(spec, params, X, k=3, seed=11, B=10,
                           labeled_x=L, labeled_y=ly), "influence")

    posts = batched_forward(spec, params, X, 16)["posteriors"]
    sel = np.asarray(uncertainty_filter(posts, 10))
    n_tr, pad = 7, (-7) % 256
    tx = np.concatenate([L, np.zeros((pad, 8, 8, 1), np.float32)])
    y = np.zeros(n_tr + pad, np.int64)
    y[:n_tr] = ly
    ty = make_onehot(y, 2)
    # (the branch consumes one host-rng draw for the solver key; in cg
    # mode the key is unused, so the composition needs no key here)
    st = s_test(spec, params, jnp.asarray(tx), jnp.asarray(ty),
                jnp.asarray(tx), jnp.asarray(ty), damping=0.1,
                n_valid=n_tr, q_n_valid=n_tr)
    cy = make_onehot(np.argmax(posts[sel], axis=1).astype(np.int64), 2)
    scores = influence_scores(spec, params, st, X[sel], cy)
    oracle = sel[np.argsort(-np.abs(scores), kind="stable")[:3]]
    assert picks.tolist() == oracle.tolist()


def test_cls_influence_deterministic():
    spec, params = _tiny_model(nclass=2)
    rng = np.random.default_rng(9)
    X = rng.normal(size=(20, 8, 8, 1)).astype(np.float32)
    L = rng.normal(size=(5, 8, 8, 1)).astype(np.float32)
    ly = rng.integers(0, 2, size=5)
    a = cls_query(_ctx(spec, params, X, k=3, seed=2, labeled_x=L,
                       labeled_y=ly), "influence")
    b = cls_query(_ctx(spec, params, X, k=3, seed=2, labeled_x=L,
                       labeled_y=ly), "influence")
    assert a.tolist() == b.tolist()


# ------------------------------------------------------------------ engine e2e
def test_cls_extra_strategies_end_to_end(tmp_path):
    from nnal_tpu.core.config import ExperimentConfig
    from nnal_tpu.engine.experiment import Experiment

    rng = np.random.default_rng(1)
    X = np.concatenate([rng.normal(size=(30, 8, 8, 1)) - 1.5,
                        rng.normal(size=(30, 8, 8, 1)) + 1.5]
                       ).astype(np.float32)
    y = np.repeat([0, 1], 30)
    perm = rng.permutation(60)
    cfg = ExperimentConfig.from_pars({
        "model_name": "PW", "nclass": 2, "patch_shape": (8, 8, 1),
        "k": 4, "B": 16, "ntb": 64, "b": 16, "epochs": 1, "MC_iters": 3,
        "learning_rate": 3e-4, "optimizer_name": "Adam",
        "dropout_rate": 0.3, "init_size": 10, "test_ratio": 0.25,
        "n_ensemble": 2,
    })
    expr = Experiment(str(tmp_path / "cls-extra"), cfg)
    expr.attach_data(X[perm], y[perm])
    run = expr.add_run()
    for m in ("core-set", "ensemble", "QBC-JS", "influence"):
        expr.add_method(m, run)
        res = expr.run_method(m, run, 4)
        assert res["n_queries"] == 4
        assert np.isfinite(res["accs"]).all()
        # membership bookkeeping invariant
        assert len(np.intersect1d(res["train_inds"],
                                  res["pool_inds"])) == 0


def test_cls_committee_members_differ(tmp_path):
    """rng tags must give committee members distinct batch/dropout
    streams — with a shared stream every member's retrain is identical."""
    from nnal_tpu.core.config import ExperimentConfig
    from nnal_tpu.engine.experiment import Experiment
    from nnal_tpu.models.train import init_train_state

    rng = np.random.default_rng(2)
    X = rng.normal(size=(40, 8, 8, 1)).astype(np.float32)
    y = rng.integers(0, 2, size=40)
    cfg = ExperimentConfig.from_pars({
        "model_name": "PW", "nclass": 2, "patch_shape": (8, 8, 1),
        "k": 4, "b": 8, "epochs": 1, "learning_rate": 1e-3,
        "optimizer_name": "Adam", "dropout_rate": 0.3, "init_size": 8,
        "test_ratio": 0.25, "n_ensemble": 2,
    })
    expr = Experiment(str(tmp_path / "cls-comm"), cfg)
    expr.attach_data(X, y)
    spec = expr.build_model()
    params, bn = init_cnn(spec, jax.random.key(0))
    state, tx = init_train_state(spec, params, "Adam", 1e-3, bn_state=bn,
                                 tx=expr._cached_tx())
    members = expr._build_committee(spec, state, tx, np.arange(8), 1)
    assert len(members) == 2
    la, lb = (jax.tree_util.tree_leaves(m) for m in members)
    assert any(not np.array_equal(a, b) for a, b in zip(la, lb))


# --------------------------------------------------------------- influence
def test_cls_influence_arnoldi_mode_plumbing():
    """The cls influence path honors ``extra['influence_mode']='arnoldi'``
    (shared ``_s_test_dispatch`` seam): valid distinct picks, deterministic
    for a fixed rng stream, and distinct rng keys for Lanczos vs the MC
    family (the fold-discipline constant (1<<20)+29)."""
    spec, params = _tiny_model(nclass=2)
    rng = np.random.default_rng(5)
    X = rng.normal(size=(30, 8, 8, 1)).astype(np.float32)
    L = rng.normal(size=(6, 8, 8, 1)).astype(np.float32)
    ly = rng.integers(0, 2, size=6)

    def run():
        ctx = _ctx(spec, params, X, k=4, seed=9, labeled_x=L, labeled_y=ly,
                   extra={"influence_mode": "arnoldi", "arnoldi_rank": 6,
                          "damping": 0.5})
        return cls_query(ctx, "influence")

    a, b = run(), run()
    assert len(a) == 4 == len(np.unique(a))
    assert set(a) <= set(range(30))
    assert a.tolist() == b.tolist()
