import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnal_tpu.models.cnn import (
    apply_cnn,
    count_parameters,
    init_cnn,
)
from nnal_tpu.models.specs import (
    create_densenet_2block,
    create_model,
    create_pw1,
    create_tiramisu103,
    create_vgg,
    with_aleatoric_head,
)


def test_pw1_shapes():
    spec = create_pw1(nclass=2, dropout_rate=0.5, patch_shape=(25, 25, 2))
    key = jax.random.key(0)
    params, state = init_cnn(spec, key)
    x = jnp.ones((3, 25, 25, 2))
    out = apply_cnn(spec, params, x)
    assert out.logits.shape == (3, 2)
    assert out.posteriors.shape == (3, 2)
    np.testing.assert_allclose(np.asarray(out.posteriors.sum(-1)), 1.0,
                               rtol=1e-5)
    assert out.prediction.shape == (3,)
    assert out.feature.shape == (3, 4096)       # fc2 is the feature layer
    assert len(out.probes) == 1                  # probe on conv4 (index 4)
    # parameter count: fc1 takes the 7x7x96 pooled map (25->13->7 with SAME)
    n = count_parameters(params)
    assert n > 4096 * 4096  # sanity: dominated by the FC stack


def test_pw1_deterministic_and_batch_consistent():
    spec = create_pw1(2, 0.5, (13, 13, 1))
    params, _ = init_cnn(spec, jax.random.key(1))
    x = jax.random.normal(jax.random.key(2), (4, 13, 13, 1))
    p1 = apply_cnn(spec, params, x).posteriors
    p2 = apply_cnn(spec, params, x).posteriors
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    # row i of a batch equals the single-sample forward (static batch math)
    single = apply_cnn(spec, params, x[1:2]).posteriors
    np.testing.assert_allclose(np.asarray(p1[1]), np.asarray(single[0]),
                               rtol=2e-4, atol=1e-6)


def test_dropout_mc_variability():
    spec = create_pw1(2, 0.5, (13, 13, 1))
    params, _ = init_cnn(spec, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 13, 13, 1))
    a = apply_cnn(spec, params, x, mc_dropout=True,
                  dropout_rng=jax.random.key(10)).posteriors
    b = apply_cnn(spec, params, x, mc_dropout=True,
                  dropout_rng=jax.random.key(11)).posteriors
    c = apply_cnn(spec, params, x).posteriors
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # eval mode ignores dropout entirely
    d = apply_cnn(spec, params, x, dropout_rng=jax.random.key(10)).posteriors
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


def test_vgg_and_densenet_build():
    spec = create_vgg(10, 0.5, 16, input_shape=(32, 32, 3))
    params, _ = init_cnn(spec, jax.random.key(0))
    out = apply_cnn(spec, params, jnp.ones((2, 32, 32, 3)))
    assert out.logits.shape == (2, 10)

    spec = create_densenet_2block(5, growth=4, depth=2, input_shape=(16, 16, 3))
    params, state = init_cnn(spec, jax.random.key(0))
    assert state  # BN layers present
    out = apply_cnn(spec, params, jnp.ones((2, 16, 16, 3)), state=state)
    assert out.logits.shape == (2, 5)


def test_tiramisu_fcn_2d():
    spec = create_tiramisu103(2, (32, 32, 1), growth=2,
                              depths=(2, 2, 2), dropout_rate=0.1)
    params, state = init_cnn(spec, jax.random.key(0))
    out = apply_cnn(spec, params, jnp.ones((1, 32, 32, 1)), state=state)
    # dense-prediction head: per-pixel logits at input resolution
    assert out.logits.shape == (1, 32, 32, 2)
    assert out.prediction.shape == (1, 32, 32)


def test_tiramisu_fcn_3d():
    spec = create_tiramisu103(2, (16, 16, 8, 1), growth=2, depths=(2, 2))
    params, state = init_cnn(spec, jax.random.key(0))
    out = apply_cnn(spec, params, jnp.ones((1, 16, 16, 8, 1)), state=state)
    assert out.logits.shape == (1, 16, 16, 8, 2)


def test_aleatoric_head():
    spec = with_aleatoric_head(create_pw1(2, 0.5, (13, 13, 1)))
    params, _ = init_cnn(spec, jax.random.key(0))
    out = apply_cnn(spec, params, jnp.ones((2, 13, 13, 1)))
    assert out.logits.shape == (2, 2)
    assert out.log_sigma.shape == (2, 2)


def test_factory_dispatch():
    spec = create_model("PW", nclass=2, dropout_rate=0.4,
                        patch_shape=(25, 25, 1))
    assert spec.name == "PW1"
    with pytest.raises(ValueError):
        create_model("nope", nclass=2)


def test_bn_train_updates_state():
    spec = create_densenet_2block(3, growth=4, depth=2,
                                  input_shape=(8, 8, 3))
    params, state = init_cnn(spec, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (8, 8, 8, 3)) * 3 + 1
    out = apply_cnn(spec, params, x, train=True, state=state,
                    dropout_rng=jax.random.key(2))
    name = next(iter(state))
    assert not np.allclose(np.asarray(out.state[name]["mean"]),
                           np.asarray(state[name]["mean"]))
