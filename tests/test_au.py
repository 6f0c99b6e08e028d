"""Aleatoric (AU_4L) training integration + AU_4U output-perturbation
uncertainty (reference NN_extended.py:913,1502-1562)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnal_tpu.core.config import ExperimentConfig
from nnal_tpu.data.io import synthetic_subject
from nnal_tpu.engine.pw_experiment import PWExperiment
from nnal_tpu.models.cnn import apply_cnn, init_cnn
from nnal_tpu.models.perturb import (
    measure_output_perturbation,
    perturb_input,
    rotate_2d,
)
from nnal_tpu.models.specs import create_model, with_aleatoric_head


@pytest.fixture(scope="module")
def au_spec():
    spec = create_model("PW", nclass=2, dropout_rate=0.2,
                        patch_shape=(9, 9, 1))
    return with_aleatoric_head(spec)


def test_aleatoric_head_shapes(au_spec):
    params, _ = init_cnn(au_spec, jax.random.key(0))
    x = jnp.zeros((4, 9, 9, 1))
    out = apply_cnn(au_spec, params, x)
    assert out.logits.shape == (4, 2)
    assert out.log_sigma.shape == (4, 2)
    assert out.posteriors.shape == (4, 2)


def test_aleatoric_train_step_moves_sigma(au_spec):
    from nnal_tpu.models.train import init_train_state, make_train_step

    params, _ = init_cnn(au_spec, jax.random.key(0))
    state, tx = init_train_state(au_spec, params, "Adam", 1e-2)
    step = make_train_step(au_spec, tx, mc_t=4)
    rng = jax.random.key(1)
    x = jax.random.normal(jax.random.fold_in(rng, 0), (16, 9, 9, 1))
    y = jnp.asarray(np.eye(2)[np.arange(16) % 2], jnp.float32)
    sig0 = np.asarray(apply_cnn(au_spec, state.params, x).log_sigma)
    p, o, loss = step(state.params, state.opt_state, x, y, rng,
                      jnp.asarray(0))
    for _ in range(5):
        p, o, loss = step(p, o, x, y, rng, jnp.asarray(0))
    assert np.isfinite(float(loss))
    sig1 = np.asarray(apply_cnn(au_spec, p, x).log_sigma)
    assert np.abs(sig1 - sig0).max() > 1e-6   # sigma head actually trains


def test_rotate_2d_quarter_turn():
    x = np.zeros((1, 5, 5, 1), np.float32)
    x[0, 0, 2, 0] = 1.0                       # top-center pixel
    r = np.asarray(rotate_2d(jnp.asarray(x), np.pi / 2))
    # after a 90-degree rotation the hot pixel moves to a side-center
    assert r.max() > 0.9
    assert r[0, 0, 2, 0] < 0.1


def test_perturb_input_noise_stats():
    x = jnp.zeros((8, 9, 9, 1))
    xp = perturb_input(x, jax.random.key(0), gaussian_std=0.1)
    s = float(jnp.std(xp))
    assert 0.05 < s < 0.2


def test_output_perturbation_measures(au_spec):
    params, _ = init_cnn(au_spec, jax.random.key(0))
    x = jax.random.normal(jax.random.key(2), (8, 9, 9, 1))
    # zero perturbation, same params -> L2 divergence exactly 0
    d0 = measure_output_perturbation(au_spec, params, x, jax.random.key(3),
                                     measure="L2", gaussian_std=None,
                                     rotation_angle=None)
    np.testing.assert_allclose(np.asarray(d0), 0.0, atol=1e-7)
    # noise -> strictly larger L2 divergence
    d1 = measure_output_perturbation(au_spec, params, x, jax.random.key(3),
                                     measure="L2", gaussian_std=0.5)
    assert float(jnp.mean(d1)) > float(jnp.mean(d0))
    # CE lower-bounds at the clean posterior's entropy
    dce = measure_output_perturbation(au_spec, params, x,
                                      jax.random.key(3), measure="CE",
                                      gaussian_std=None,
                                      rotation_angle=None)
    p = np.asarray(apply_cnn(au_spec, params, x).posteriors)
    ent = -(p * np.log(np.clip(p, 1e-12, 1))).sum(-1)
    np.testing.assert_allclose(np.asarray(dce), ent, rtol=1e-4, atol=1e-5)


def test_e2e_au_headed_campaign(tmp_path):
    """AL campaign with an AU-headed PW1 and the AU_4U strategy."""
    cfg = ExperimentConfig.from_pars({
        "model_name": "PW", "patch_shape": (9, 9, 1), "grid_spacing": 4,
        "k": 3, "B": 20, "ntb": 256, "b": 16, "epochs": 1, "MC_iters": 2,
        "learning_rate": 3e-4, "optimizer_name": "Adam",
        "dropout_rate": 0.2, "init_size": 4, "seed": 6,
        "aleatoric": True, "mc_t": 4, "gaussian_noise_std": 0.1})
    vols, mask = synthetic_subject(shape=(24, 24, 8), n_modalities=1,
                                   seed=6)
    expr = PWExperiment(str(tmp_path / "au"), cfg)
    expr.attach_subject(vols, mask)
    expr.prep_data()
    expr.add_method("AU_4U")
    res = expr.run_method("AU_4U", 6)
    assert res["n_queries"] == 6
    assert np.isfinite(res["perf"]).all()
