"""Classification-engine MC-dropout extras (MC-entropy, BALD, BatchBALD
in multiclass form) + the multiclass BatchBALD kernel."""

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.scoring.batchbald import batchbald_select_probs
from nnal_tpu.scoring.uncertainty import multiclass_bald_from_mc


def test_multiclass_first_pick_is_bald_argmax():
    """Step 0 of the sampled estimator is exact for any M and any C."""
    rng = np.random.default_rng(0)
    P = rng.dirichlet(np.ones(4), size=(6, 30)).astype(np.float32)
    bald = np.asarray(multiclass_bald_from_mc(jnp.asarray(P)))
    for m in (16, 256):
        chosen = np.asarray(batchbald_select_probs(
            jnp.asarray(P), 3, jax.random.key(1), m_configs=m))
        assert chosen[0] == int(np.argmax(bald))


def test_multiclass_duplicate_avoidance():
    """A bit-identical twin of the best column must not be the second
    pick (its joint gain is exactly zero)."""
    rng = np.random.default_rng(2)
    T, C = 6, 3
    strong = rng.dirichlet(np.ones(C) * 0.3, size=T).astype(np.float32)
    other = rng.dirichlet(np.ones(C) * 0.5, size=T).astype(np.float32)
    flat = np.full((T, C), 1.0 / C, np.float32)
    P = np.stack([strong, strong, other, flat], axis=1)   # (T, 4, C)
    chosen = np.asarray(batchbald_select_probs(
        jnp.asarray(P), 2, jax.random.key(3), m_configs=2048))
    assert set(chosen.tolist()) in ({0, 2}, {1, 2})


def test_multiclass_deterministic_distinct():
    rng = np.random.default_rng(4)
    P = rng.dirichlet(np.ones(3), size=(5, 20)).astype(np.float32)
    a = np.asarray(batchbald_select_probs(jnp.asarray(P), 6,
                                          jax.random.key(5)))
    b = np.asarray(batchbald_select_probs(jnp.asarray(P), 6,
                                          jax.random.key(5)))
    assert np.array_equal(a, b)
    assert len(set(a.tolist())) == 6


def test_cls_mc_strategies_end_to_end(tmp_path):
    """MC-entropy / BALD / BatchBALD through the classification engine."""
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
        "k": 4, "B": 16, "ntb": 64, "b": 16, "epochs": 2, "MC_iters": 3,
        "learning_rate": 3e-4, "optimizer_name": "Adam",
        "dropout_rate": 0.3, "init_size": 10, "test_ratio": 0.25,
    })
    expr = Experiment(str(tmp_path / "cls-mc"), cfg)
    expr.attach_data(X[perm], y[perm])
    run = expr.add_run()
    for m in ("MC-entropy", "BALD", "BatchBALD"):
        expr.add_method(m, run)
        res = expr.run_method(m, run, 4)
        assert res["n_queries"] == 4
        assert np.isfinite(res["accs"]).all()


def test_cls_mc_passes_are_stochastic_but_replayable():
    """Different MC passes must see different dropout masks, and the same
    rng state must reproduce the same stack (journal-replay contract)."""
    from nnal_tpu.models.cnn import init_cnn
    from nnal_tpu.models.specs import create_model
    from nnal_tpu.scoring.cls_strategies import batched_forward

    spec = create_model("PW", nclass=2, dropout_rate=0.5,
                        patch_shape=(8, 8, 1))
    params, _ = init_cnn(spec, jax.random.key(0))
    X = np.asarray(jax.random.normal(jax.random.key(1), (20, 8, 8, 1)))
    a = batched_forward(spec, params, X, 8,
                        mc_rng=jax.random.key(7))["posteriors"]
    b = batched_forward(spec, params, X, 8,
                        mc_rng=jax.random.key(8))["posteriors"]
    c = batched_forward(spec, params, X, 8,
                        mc_rng=jax.random.key(7))["posteriors"]
    assert not np.array_equal(a, b)      # masks differ across keys
    assert np.array_equal(a, c)          # same key reproduces exactly
