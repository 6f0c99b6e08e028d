"""v2-generation model features: FCN training (Tiramisu), mean-teacher SSL,
aleatoric heads, BN-stats refresh (reference NN_extended feature set)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nnal_tpu.models.cnn import apply_cnn, init_cnn
from nnal_tpu.models.losses import aleatoric_ce, consistency_loss
from nnal_tpu.models.optim import make_optimizer, sigmoid_rampup
from nnal_tpu.models.specs import create_tiramisu103, create_pw1, with_aleatoric_head
from nnal_tpu.models.train import TrainState, make_train_step, train


def test_tiramisu_fcn_training_step():
    spec = create_tiramisu103(2, (16, 16, 1), growth=2, depths=(2, 2),
                              dropout_rate=0.1)
    params, state = init_cnn(spec, jax.random.key(0))
    tx = make_optimizer("Adam", 1e-3)
    step = make_train_step(spec, tx, fcn=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 1)), jnp.float32)
    y = np.zeros((2, 16, 16, 2), np.float32)
    y[..., 0] = 1.0
    y[0, :4, :4] = [0.0, 1.0]
    y[1, 10:, 10:] = np.nan   # unlabeled region must not contribute
    y = jnp.asarray(y)
    opt_state = tx.init(params)
    losses = []
    for i in range(8):
        params, opt_state, loss = step(params, opt_state, x, y,
                                       jax.random.key(i), jnp.asarray(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_mean_teacher_training():
    spec = create_pw1(2, 0.2, (9, 9, 1))
    params, _ = init_cnn(spec, jax.random.key(0))
    tx = make_optimizer("Adam", 3e-4)
    coeff = sigmoid_rampup(50)
    step = make_train_step(spec, tx, consistency_coeff=coeff,
                           consistency_measure="MSE")
    w0 = np.asarray(params["fc3"]["W"]).copy()  # before donation
    state = TrainState(params=params, opt_state=tx.init(params),
                       teacher_params=jax.tree_util.tree_map(jnp.copy,
                                                             params))
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.normal(size=(16, 9, 9, 1)) - 2,
                        rng.normal(size=(16, 9, 9, 1)) + 2]).astype(
                            np.float32)
    y = np.eye(2)[np.repeat([0, 1], 16)].astype(np.float32)

    def gen():
        while True:
            yield x, y

    state, _ = train(spec, state, step, gen(), step_limit=10,
                     rng=jax.random.key(1))
    # teacher EMA moved toward the student
    d = np.abs(np.asarray(state.teacher_params["fc3"]["W"]) - w0).max()
    assert d > 0
    assert np.isfinite(state.metrics["train_loss"]).all()


def test_consistency_loss_directions():
    s = jnp.asarray([[2.0, -2.0]])
    t = jnp.asarray([[2.0, -2.0]])
    near = float(consistency_loss(s, t, "MSE"))
    far = float(consistency_loss(s, -t, "MSE"))
    assert near < far


def test_aleatoric_head_training():
    spec = with_aleatoric_head(create_pw1(2, 0.0, (9, 9, 1)))
    params, _ = init_cnn(spec, jax.random.key(0))
    tx = make_optimizer("Adam", 3e-4)
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.concatenate([rng.normal(size=(8, 9, 9, 1)) - 2,
                                    rng.normal(size=(8, 9, 9, 1)) + 2]),
                    jnp.float32)
    y = jnp.asarray(np.eye(2)[np.repeat([0, 1], 8)], jnp.float32)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            out = apply_cnn(spec, p, x)
            return aleatoric_ce(out.logits, out.log_sigma, y, key, mc_t=5)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(10):
        params, opt_state, loss = step(params, opt_state, jax.random.key(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    out = apply_cnn(spec, params, x)
    assert out.log_sigma.shape == (16, 2)


def test_bn_eval_uses_running_stats():
    from nnal_tpu.models.specs import create_densenet_2block

    spec = create_densenet_2block(2, growth=4, depth=2,
                                  input_shape=(8, 8, 1))
    params, state = init_cnn(spec, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (4, 8, 8, 1)) * 5
    # train-mode forward computes batch stats; eval uses the running ones
    out_train = apply_cnn(spec, params, x, train=True, state=state,
                          dropout_rng=jax.random.key(2))
    out_eval = apply_cnn(spec, params, x, state=state)
    assert not np.allclose(np.asarray(out_train.logits),
                           np.asarray(out_eval.logits))
