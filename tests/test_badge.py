"""BADGE (gradient-embedding k-means++) — a TPU-native extra strategy
beyond the reference's set (Ash et al., ICLR 2020)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnal_tpu.scoring.representative import badge_embeddings, badge_kmeanspp


def test_badge_embeddings_oracle():
    """Embedding = (p - onehot(argmax p)) (x) h, vs a numpy transcription."""
    rng = np.random.default_rng(0)
    H = rng.normal(size=(7, 5)).astype(np.float32)
    p1 = rng.uniform(size=7).astype(np.float32)
    E = np.asarray(badge_embeddings(jnp.asarray(H), jnp.asarray(p1)))
    p = np.stack([1 - p1, p1], axis=1)
    for i in range(7):
        c = p[i] - np.eye(2)[np.argmax(p[i])]
        want = np.concatenate([c[0] * H[i], c[1] * H[i]])
        np.testing.assert_allclose(E[i], want, rtol=1e-6)
    # embedding norm carries the uncertainty signal:
    # ||g|| = sqrt(2) * (1 - max-class confidence) * ||h|| exactly
    conf = np.max(p, axis=1)
    norms = np.linalg.norm(E, axis=1)
    ratio = norms / (np.sqrt(2) * (1 - conf) * np.linalg.norm(H, axis=1))
    np.testing.assert_allclose(ratio, 1.0, rtol=1e-5)


def test_badge_multiclass_embeddings_oracle():
    """(n, C*d) multiclass embeddings vs a numpy transcription (C=3); the
    binary shortcut must agree with the multiclass path exactly."""
    from nnal_tpu.scoring.representative import badge_embeddings_multiclass

    rng = np.random.default_rng(3)
    H = rng.normal(size=(5, 4)).astype(np.float32)
    P = rng.dirichlet(np.ones(3), size=5).astype(np.float32)
    E = np.asarray(badge_embeddings_multiclass(jnp.asarray(H),
                                               jnp.asarray(P)))
    for i in range(5):
        c = P[i] - np.eye(3)[np.argmax(P[i])]
        want = np.concatenate([c[j] * H[i] for j in range(3)])
        np.testing.assert_allclose(E[i], want, rtol=1e-6)

    p1 = rng.uniform(size=5).astype(np.float32)
    a = np.asarray(badge_embeddings(jnp.asarray(H), jnp.asarray(p1)))
    b = np.asarray(badge_embeddings_multiclass(
        jnp.asarray(H), jnp.stack([1 - p1, p1], axis=1)))
    assert np.array_equal(a, b)


def test_badge_classification_engine(tmp_path):
    """Multi-class BADGE through the classification engine dispatch."""
    from nnal_tpu.core.config import ExperimentConfig
    from nnal_tpu.engine.experiment import Experiment

    rng = np.random.default_rng(0)
    X = np.concatenate([rng.normal(size=(30, 8, 8, 1)) - 1.5,
                        rng.normal(size=(30, 8, 8, 1)) + 1.5]
                       ).astype(np.float32)
    y = np.repeat([0, 1], 30)
    perm = rng.permutation(60)
    cfg = ExperimentConfig.from_pars({
        "model_name": "PW", "nclass": 2, "patch_shape": (8, 8, 1),
        "k": 4, "B": 16, "ntb": 64, "b": 16, "epochs": 2,
        "learning_rate": 3e-4, "optimizer_name": "Adam",
        "dropout_rate": 0.2, "init_size": 10, "test_ratio": 0.25,
    })
    expr = Experiment(str(tmp_path / "cls-badge"), cfg)
    expr.attach_data(X[perm], y[perm])
    run = expr.add_run()
    expr.add_method("BADGE", run)
    res = expr.run_method("BADGE", run, 8)
    assert res["n_queries"] == 8
    assert np.isfinite(res["accs"]).all()


def test_kmeanspp_covers_separated_clusters():
    """Three far-apart duplicate clusters: within-cluster distance is
    exactly 0, so after the first pick the sampler MUST leave the cluster
    — k=3 covers all three, whatever the key."""
    base = np.array([[0.0, 0.0], [100.0, 0.0], [0.0, 100.0]])
    E = jnp.asarray(np.repeat(base, 4, axis=0))    # 12 points, 3 clusters
    for seed in range(5):
        chosen = np.asarray(badge_kmeanspp(E, 3, jax.random.key(seed)))
        assert len(set(chosen.tolist())) == 3
        assert set(chosen // 4) == {0, 1, 2}


def test_kmeanspp_all_duplicates_fallback():
    """Identical points: every distance is 0; the fallback still returns
    k DISTINCT indices (duplicate queries would corrupt the journal)."""
    E = jnp.ones((6, 3))
    chosen = np.asarray(badge_kmeanspp(E, 4, jax.random.key(1)))
    assert len(set(chosen.tolist())) == 4


def test_kmeanspp_deterministic_per_key():
    rng = np.random.default_rng(2)
    E = jnp.asarray(rng.normal(size=(40, 8)).astype(np.float32))
    a = np.asarray(badge_kmeanspp(E, 5, jax.random.key(3)))
    b = np.asarray(badge_kmeanspp(E, 5, jax.random.key(3)))
    assert np.array_equal(a, b)
    assert len(set(a.tolist())) == 5
    # the key must actually drive the sampling: across several keys at
    # least one selection differs (any single pair may legitimately tie)
    others = [np.asarray(badge_kmeanspp(E, 5, jax.random.key(s)))
              for s in range(4, 9)]
    assert any(not np.array_equal(a, o) for o in others)


@pytest.mark.slow
def test_badge_single_subject_campaign(tmp_path):
    """End-to-end through the engine dispatch (generic method routing)."""
    from nnal_tpu.cli.expr_handler import do_expr

    overrides = ("patch_shape=[9,9,1],grid_spacing=4,k=5,B=30,ntb=256,"
                 "b=32,epochs=1,MC_iters=2,init_size=6,"
                 "learning_rate=1e-3,optimizer_name=Adam,"
                 "synthetic_shape=[24,24,8],synthetic_blobs=6")
    res = do_expr(str(tmp_path / "badge"), "BADGE", 10, overrides,
                  synthetic=True)
    assert res["n_queries"] == 10
    assert np.isfinite(res["perf"]).all()


@pytest.mark.slow
def test_badge_multi_subject(tmp_path):
    from nnal_tpu.core.config import ExperimentConfig
    from nnal_tpu.data.io import synthetic_subject
    from nnal_tpu.engine.multi_experiment import MultiImgExperiment

    cfg = ExperimentConfig.from_pars({
        "model_name": "PW", "nclass": 2, "patch_shape": (9, 9, 1),
        "grid_spacing": 5, "k": 3, "B": 12, "ntb": 256, "b": 32,
        "epochs": 1, "MC_iters": 2, "learning_rate": 3e-4,
        "optimizer_name": "Adam", "dropout_rate": 0.2, "init_size": 6,
    })
    subs = [synthetic_subject(shape=(20, 20, 6), n_modalities=1, seed=s)
            for s in range(2)]
    expr = MultiImgExperiment(str(tmp_path / "badge-multi"), cfg)
    expr.attach_subjects(subs)
    expr.prep_data()
    expr.add_method("BADGE")
    res = expr.run_method("BADGE", 3)
    assert res["n_queries"] >= 1
    assert len(np.intersect1d(res["train_global"],
                              res["pool_global"])) == 0
