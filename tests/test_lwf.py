"""Learning-without-forgetting wiring (reference ``get_LwF``,
model_utils.py:98-135): the distillation term is part of the training
surface (config keys lwf_lambda / lwf_T -> make_train_step /
make_scanned_finetune), not just a loss function."""

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.core.config import ExperimentConfig
from nnal_tpu.data.io import synthetic_subject
from nnal_tpu.engine.pw_experiment import PWExperiment
from nnal_tpu.models.cnn import apply_cnn, init_cnn
from nnal_tpu.models.optim import make_optimizer
from nnal_tpu.models.specs import create_pw1
from nnal_tpu.models.train import make_train_step


def test_train_step_lwf_loss_matches_manual():
    """One step's loss == CE + lambda * distillation at temperature T."""
    spec = create_pw1(2, 0.0, (9, 9, 1))
    params, _ = init_cnn(spec, jax.random.key(0))
    tx = make_optimizer("SGD", 0.0)   # lr 0: loss probe only
    lam, T = 0.7, 3.0
    step = make_train_step(spec, tx, lwf_lambda=lam, lwf_T=T)
    rng = jax.random.key(1)
    x = jax.random.normal(jax.random.key(2), (8, 9, 9, 1))
    y = jnp.asarray(np.eye(2)[np.arange(8) % 2], jnp.float32)
    old_params, _ = init_cnn(spec, jax.random.key(3))
    old_logits = apply_cnn(spec, old_params, x).logits
    # oracle forward BEFORE the step: step_fn donates the params buffers
    logits = apply_cnn(spec, params, x).logits   # dropout 0 -> same as train

    _, _, loss = step(params, tx.init(params), x, y, rng,
                      jnp.asarray(0), None, None, old_logits)

    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -np.mean(np.sum(np.asarray(y) * np.asarray(logp), -1))
    soft = jax.nn.softmax(old_logits / T, axis=-1)
    lp_t = jax.nn.log_softmax(logits / T, axis=-1)
    distill = -np.mean(np.sum(np.asarray(soft) * np.asarray(lp_t), -1))
    np.testing.assert_allclose(float(loss), ce + lam * distill,
                               rtol=1e-5, atol=1e-6)


def test_lwf_finetune_preserves_old_posteriors(tmp_path):
    """Config-driven LwF: finetuning with lwf_lambda > 0 must keep the
    post-finetune model's softened outputs closer to the pre-finetune
    model's than plain finetuning does.  The comparison metric is the
    distillation cross-entropy itself (old soft targets at temperature T
    vs the new model, on held-out patches) — raw posterior drift is
    useless here because CE training saturates posteriors to exactly 0/1
    on both runs."""
    from nnal_tpu.core.journal import load_inds
    from nnal_tpu.data.patches import gather_patches_normalized, pad_volumes
    from nnal_tpu.models.checkpoint import load_checkpoint
    from nnal_tpu.models.train import init_train_state

    # dense blobs + a larger init set so the labeled set carries BOTH
    # classes (with a single-class set CE's reward is unbounded and any
    # finite distillation coefficient eventually loses)
    vols, mask = synthetic_subject(shape=(24, 24, 8), n_modalities=1,
                                   seed=2, n_blobs=10)
    T = 2.0
    distill = {}
    for lam in (0.0, 50.0):
        pars = {
            "model_name": "PW", "patch_shape": (9, 9, 1),
            "grid_spacing": 5, "k": 3, "B": 12, "ntb": 256, "b": 16,
            "epochs": 2, "learning_rate": 3e-4, "optimizer_name": "Adam",
            "dropout_rate": 0.0, "init_size": 32, "seed": 5,
            "lwf_lambda": lam, "lwf_T": T,
        }
        expr = PWExperiment(str(tmp_path / f"lwf{lam}"),
                            ExperimentConfig.from_pars(pars))
        expr.attach_subject(vols, mask)
        expr.prep_data()
        j = expr.add_method("entropy")
        spec = expr.build_model()
        params, bn, _, _ = load_checkpoint(j.path("curr_weights.npz"))
        params = jax.tree_util.tree_map(jnp.asarray, params)
        params_before = jax.tree_util.tree_map(jnp.copy, params)
        state, tx = init_train_state(spec, params, "Adam", 3e-4)
        test_inds = load_inds(expr._p("test_inds.txt"))
        mu, sd = expr._stats_arrays()
        padded = pad_volumes(vols, (9, 9, 1))
        x_test = gather_patches_normalized(
            padded, jnp.asarray(test_inds), mu, sd, (9, 9, 1),
            tuple(vols[0].shape))
        logits_before = apply_cnn(spec, params_before, x_test).logits
        train_inds, _ = j.membership()
        state = expr.finetune(spec, (state, tx), train_inds)
        logits_after = apply_cnn(spec, state.params, x_test).logits
        soft_b = jax.nn.softmax(logits_before / T, axis=-1)
        distill[lam] = float(-jnp.mean(jnp.sum(
            soft_b * jax.nn.log_softmax(logits_after / T, -1), -1)))
    assert distill[50.0] < distill[0.0], distill
