import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.evaluation.metrics import (
    accuracy,
    binary_f1,
    example_based_pr,
    f_measure,
    multi_f1,
    partitioned_f1,
    preds_stats,
)
from nnal_tpu.models.checkpoint import load_checkpoint, save_checkpoint
from nnal_tpu.models.cnn import apply_cnn, init_cnn
from nnal_tpu.models.losses import (
    cross_entropy,
    fcn_cross_entropy,
    focal_loss,
    generalized_ce,
    lwf_loss,
)
from nnal_tpu.models.optim import (
    ema_update,
    layer_train_mask,
    pft_mask_from_saliency,
    sigmoid_rampup,
)
from nnal_tpu.models.specs import create_pw1
from nnal_tpu.models.train import init_train_state, make_train_step


def small_spec():
    return create_pw1(2, 0.2, (9, 9, 1))


def test_losses_oracle():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(6, 3)), jnp.float32)
    y = jnp.asarray(np.eye(3)[[0, 1, 2, 0, 1, 2]], jnp.float32)
    P = np.asarray(jax.nn.softmax(logits, axis=-1))
    ce = float(cross_entropy(logits, y))
    oracle = -np.mean(np.log(P[np.arange(6), [0, 1, 2, 0, 1, 2]]))
    assert np.isclose(ce, oracle, rtol=1e-5)
    # focal with gamma=0 reduces to CE
    assert np.isclose(float(focal_loss(logits, y, gamma=0.0)), ce, rtol=1e-5)
    # GCE approaches CE as q->0
    g = float(generalized_ce(logits, y, q=1e-4))
    assert np.isclose(g, ce, rtol=2e-2)
    # LwF with lambda 0 is CE
    assert np.isclose(float(lwf_loss(logits, y, logits, 0.0)), ce, rtol=1e-5)


def test_fcn_loss_nan_masking():
    logits = jnp.zeros((1, 2, 2, 2))
    y = np.zeros((1, 2, 2, 2), np.float32)
    y[0, :, :, 0] = 1.0
    y[0, 1, 1, :] = np.nan  # unlabeled voxel must be excluded
    full = float(fcn_cross_entropy(logits, jnp.asarray(y)))
    assert np.isclose(full, -np.log(0.5), rtol=1e-5)


def test_train_step_learns():
    spec = small_spec()
    params, _ = init_cnn(spec, jax.random.key(0))
    state, tx = init_train_state(spec, params, "Adam", 3e-4)
    step = make_train_step(spec, tx)
    rng = np.random.default_rng(0)
    # separable toy task: bright vs dark patches
    x0 = rng.normal(size=(32, 9, 9, 1)) - 2
    x1 = rng.normal(size=(32, 9, 9, 1)) + 2
    x = jnp.asarray(np.concatenate([x0, x1]), jnp.float32)
    y = jnp.asarray(np.concatenate([np.tile([1, 0], (32, 1)),
                                    np.tile([0, 1], (32, 1))]), jnp.float32)
    losses = []
    for i in range(25):
        state.params, state.opt_state, loss = step(
            state.params, state.opt_state, x, y,
            jax.random.key(i), jnp.asarray(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5
    preds = apply_cnn(spec, state.params, x).prediction
    assert accuracy(np.asarray(preds), np.repeat([0, 1], 32)) > 0.9


def test_learning_rate_reaches_optimizer():
    spec = small_spec()
    params, _ = init_cnn(spec, jax.random.key(0))
    x = jnp.ones((2, 9, 9, 1))
    y = jnp.asarray(np.eye(2)[[0, 1]], jnp.float32)
    outs = []
    for lr in (1e-2, 1e-4):
        # copy: the train step donates its param buffers
        p0 = jax.tree_util.tree_map(jnp.copy, params)
        st, tx = init_train_state(spec, p0, "SGD", lr)
        step = make_train_step(spec, tx)
        p, _, _ = step(st.params, st.opt_state, x, y, jax.random.key(0),
                       jnp.asarray(0))
        outs.append(np.asarray(p["fc3"]["W"]))
    d0 = np.abs(outs[0] - np.asarray(params["fc3"]["W"])).max()
    d1 = np.abs(outs[1] - np.asarray(params["fc3"]["W"])).max()
    assert d0 > 50 * d1  # updates scale with the learning rate


def test_train_mask_freezes_layers():
    spec = small_spec()
    params, _ = init_cnn(spec, jax.random.key(0))
    mask = layer_train_mask(params, ["fc3"])
    state, tx = init_train_state(spec, params, "SGD", 1e-2)
    step = make_train_step(spec, tx, grad_mask=mask)
    x = jnp.ones((4, 9, 9, 1))
    y = jnp.asarray(np.eye(2)[[0, 1, 0, 1]], jnp.float32)
    before = np.asarray(params["conv1"]["W"]).copy()
    before_fc3 = np.asarray(params["fc3"]["W"]).copy()
    state.params, state.opt_state, _ = step(state.params, state.opt_state,
                                            x, y, jax.random.key(0),
                                            jnp.asarray(0))
    np.testing.assert_array_equal(np.asarray(state.params["conv1"]["W"]),
                                  before)
    assert not np.allclose(np.asarray(state.params["fc3"]["W"]), before_fc3)


def test_pft_mask():
    sal = {"a": {"W": jnp.asarray([[5.0, 1.0], [0.5, 3.0]])},
           "b": {"W": jnp.asarray([2.0, 0.1])}}
    mask = pft_mask_from_saliency(sal, k=3)
    total = sum(float(np.sum(np.asarray(v))) for lay in mask.values()
                for v in lay.values())
    assert total == 3
    assert np.asarray(mask["a"]["W"])[0, 0] == 1


def test_ema_and_rampup():
    a = {"x": jnp.zeros(3)}
    b = {"x": jnp.ones(3)}
    out = ema_update(a, b, 0.9)
    # ema_update is jitted now: (1-decay) is computed in f32 inside the
    # program, so the result is 0.1 to f32 precision, not f64
    np.testing.assert_allclose(np.asarray(out["x"]), 0.1, rtol=1e-6)
    s = sigmoid_rampup(100)
    assert float(s(0)) < 0.01 and np.isclose(float(s(100)), 1.0)


def test_checkpoint_roundtrip(tmp_path):
    spec = small_spec()
    params, bn = init_cnn(spec, jax.random.key(0))
    p = str(tmp_path / "w.npz")
    save_checkpoint(p, params, bn_state=bn, al_state={"round": 3})
    params2, bn2, teacher, al = load_checkpoint(p)
    assert al == {"round": 3} and teacher is None
    np.testing.assert_array_equal(np.asarray(params["conv1"]["W"]),
                                  params2["conv1"]["W"])


def test_h5_shim_roundtrip(tmp_path):
    import pytest

    h5py = pytest.importorskip("h5py")
    from nnal_tpu.models.checkpoint import load_reference_h5, save_reference_h5

    spec = small_spec()
    params, _ = init_cnn(spec, jax.random.key(0))
    p = str(tmp_path / "ref.h5")
    save_reference_h5(p, params)
    loaded = load_reference_h5(p, params)
    np.testing.assert_array_equal(np.asarray(params["fc1"]["W"]),
                                  loaded["fc1"]["W"])


def test_metrics_suite():
    preds = np.array([1, 1, 0, 0, 1])
    mask = np.array([1, 0, 0, 1, 1])
    P, N, TP, FP, TN, FN = preds_stats(preds, mask)
    assert (P, N, TP, FP, TN, FN) == (3, 2, 2, 1, 1, 1)
    fm = f_measure(preds, mask)
    pr, rc = 2 / 3, 2 / 3
    assert np.isclose(fm, 2 / (1 / pr + 1 / rc))
    assert np.isclose(binary_f1(preds, mask), fm)
    # dict form aggregates
    fm2 = f_measure({"a": preds, "b": preds}, {"a": mask, "b": mask})
    assert np.isclose(fm2, fm)
    f1s, macro = multi_f1(preds, mask, 2)
    assert len(f1s) == 2
    p, r = example_based_pr(np.eye(3)[[0, 1]], np.eye(3)[[0, 2]])
    assert p == 0.5 and r == 0.5


def test_partitioned_f1():
    vol = np.zeros((4, 4, 6))
    vol[:, :, :3] = 1
    preds = vol.copy()
    out = partitioned_f1(preds, vol, n_slabs=3)
    assert len(out) == 3
    assert out[0] == 1.0
