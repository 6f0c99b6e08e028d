"""Full-volume inference, CRF refinement, pseudo-labels, finetune_wpool."""

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.core.config import ExperimentConfig
from nnal_tpu.data.io import synthetic_subject
from nnal_tpu.evaluation.crf import dcrf_postprocess_2d, meanfield_crf_2d
from nnal_tpu.evaluation.inference import (
    FCNInference,
    ShapeCachedFCN,
    full_slice_patchwise,
    full_volume_patchwise,
)
from nnal_tpu.models.cnn import init_cnn
from nnal_tpu.models.specs import create_pw1, create_tiramisu103
from nnal_tpu.scoring.pool_eval import PoolEvaluator
from nnal_tpu.scoring.pseudo import confident_samples


def test_full_slice_patchwise():
    vols, mask = synthetic_subject(shape=(16, 16, 4), n_modalities=1,
                                   seed=0)
    spec = create_pw1(2, 0.0, (7, 7, 1))
    params, _ = init_cnn(spec, jax.random.key(0))
    ev = PoolEvaluator.from_volumes(spec, vols, [[0.0, 1.0]], (7, 7, 1),
                                    ntb=128)
    planes = full_slice_patchwise(ev, params, [1, 3])
    assert set(planes) == {1, 3}
    assert planes[1].shape == (16, 16)
    vol = full_volume_patchwise(ev, params)
    assert vol.shape == (16, 16, 4)
    np.testing.assert_array_equal(vol[:, :, 1], planes[1])


def test_fcn_inference_and_cache():
    spec = create_tiramisu103(2, (16, 16, 1), growth=2, depths=(2, 2))
    params, _ = init_cnn(spec, jax.random.key(0))
    inf = FCNInference(spec, batch=2)
    slices = np.random.default_rng(0).normal(
        size=(5, 16, 16, 1)).astype(np.float32)
    pred = inf.segment(params, slices, "prediction")
    assert pred.shape == (5, 16, 16)
    post = inf.segment(params, slices, "posteriors")
    np.testing.assert_allclose(post.sum(-1), 1.0, rtol=1e-4)
    mc = inf.segment(params, slices, "MC-posteriors", mc_T=3,
                     rng=jax.random.key(1))
    assert mc.shape == post.shape

    cache = ShapeCachedFCN(lambda s: create_tiramisu103(
        2, s + (1,), growth=2, depths=(2, 2)))
    a = cache.for_shape((16, 16))
    b = cache.for_shape((16, 16))
    assert a is b


def test_fcn_inference_full_op_set():
    """Reference op parity for full_slice_segment (eval_utils.py:137-170):
    prediction / posteriors / MC-posteriors / sigma / MC-sigma / output /
    loss must all be served."""
    spec = create_tiramisu103(2, (16, 16, 1), growth=2, depths=(2, 2))
    params, _ = init_cnn(spec, jax.random.key(0))
    inf = FCNInference(spec, batch=2)
    slices = np.random.default_rng(0).normal(
        size=(3, 16, 16, 1)).astype(np.float32)

    raw = inf.segment(params, slices, "output")
    assert raw.shape == (3, 16, 16, 2)
    post = inf.segment(params, slices, "posteriors")
    np.testing.assert_allclose(
        post, np.asarray(jax.nn.softmax(jnp.asarray(raw), axis=-1)),
        rtol=1e-4, atol=1e-6)

    y = np.random.default_rng(1).integers(0, 2, (3, 16, 16))
    onehot = np.eye(2, dtype=np.float32)[y]
    loss = inf.segment(params, slices, "loss", labels=onehot)
    assert loss.shape == (3,)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(raw), axis=-1))
    expect = -np.mean(np.sum(onehot * logp, -1), axis=(1, 2))
    np.testing.assert_allclose(loss, expect, rtol=1e-4, atol=1e-6)

    from nnal_tpu.models.specs import with_aleatoric_head

    au = with_aleatoric_head(spec)
    au_params, _ = init_cnn(au, jax.random.key(2))
    au_inf = FCNInference(au, batch=2)
    sig = au_inf.segment(au_params, slices, "sigma")
    assert sig.shape == (3, 16, 16, 2) and (sig > 0).all()
    mcs = au_inf.segment(au_params, slices, "MC-sigma", mc_T=2,
                         rng=jax.random.key(3))
    assert mcs.shape == sig.shape and (mcs > 0).all()


def test_meanfield_crf_sharpens_noisy_posteriors():
    rng = np.random.default_rng(0)
    H = W = 24
    truth = np.zeros((H, W))
    truth[6:18, 6:18] = 1.0
    img = truth * 60 + rng.normal(0, 3, (H, W))
    # noisy posterior: mostly right, with salt noise
    p1 = 0.8 * truth + 0.1 + rng.normal(0, 0.15, (H, W))
    p1 = np.clip(p1, 0.01, 0.99)
    noisy_pred = (p1 > 0.5).astype(int)
    refined = dcrf_postprocess_2d(p1, img, iters=3)
    err_before = np.mean(noisy_pred != truth)
    err_after = np.mean(refined != truth)
    assert err_after <= err_before

    q = meanfield_crf_2d(jnp.stack([1 - jnp.asarray(p1),
                                    jnp.asarray(p1)], -1),
                         jnp.asarray(img), iters=2, radius=3)
    np.testing.assert_allclose(np.asarray(q).sum(-1), 1.0, rtol=1e-4)


def test_confident_samples():
    p1 = np.array([0.99, 0.5, 0.02, 0.8])
    pool = np.array([10, 20, 30, 40])
    inds, pseudo, mis = confident_samples(
        p1, pool, 2, true_labels=np.array([1, 0, 1, 1]))
    assert set(inds) == {10, 30}
    lab_of = dict(zip(inds.tolist(), pseudo.tolist()))
    assert lab_of[10] == 1 and lab_of[30] == 0
    assert mis == 1  # sample 30 is truly 1 but pseudo-labeled 0


def test_finetune_wpool_and_reset(tmp_path):
    from nnal_tpu.engine.pw_experiment import PWExperiment
    from nnal_tpu.models.train import init_train_state

    cfg = ExperimentConfig.from_pars({
        "model_name": "PW", "patch_shape": (9, 9, 1), "grid_spacing": 5,
        "k": 3, "B": 12, "ntb": 256, "b": 16, "epochs": 1,
        "learning_rate": 3e-4, "optimizer_name": "Adam",
        "init_size": 6})
    vols, mask = synthetic_subject(shape=(20, 20, 6), n_modalities=1,
                                   seed=0)
    expr = PWExperiment(str(tmp_path / "wp"), cfg)
    expr.attach_subject(vols, mask)
    expr.prep_data()
    j = expr.add_method("entropy")
    spec = expr.build_model()
    from nnal_tpu.models.checkpoint import load_checkpoint

    params, bn, _, _ = load_checkpoint(j.path("curr_weights.npz"))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state, tx = init_train_state(spec, params, "Adam", 3e-4)
    train_inds, pool_inds = j.membership()
    state = expr.finetune_wpool(spec, (state, tx), train_inds,
                                pool_inds, n_pseudo=5)
    assert state.step > 0

    expr.modify_parameters(k=7)
    assert expr.config.query.k == 7
    expr.reset_method("entropy")
    t2, p2 = j.membership()
    assert len(t2) == 6  # back to init_size


def test_fcn_inference_bf16_close_to_f32():
    """compute_dtype=bfloat16 serving tracks the f32 posteriors within
    bf16 resolution and keeps predictions mostly identical."""
    spec = create_tiramisu103(2, (16, 16, 1), growth=2, depths=(2, 2))
    params, _ = init_cnn(spec, jax.random.key(0))
    x = np.random.RandomState(0).randn(4, 16, 16, 1).astype(np.float32)
    p32 = FCNInference(spec, batch=2).segment(params, x, op="posteriors")
    inf16 = FCNInference(spec, batch=2, compute_dtype=jnp.bfloat16)
    p16 = inf16.segment(params, x, op="posteriors")
    assert p16.dtype == np.float32
    assert np.abs(p32 - p16).max() < 0.08
    pr32 = FCNInference(spec, batch=2).segment(params, x, op="prediction")
    pr16 = inf16.segment(params, x, op="prediction")
    assert (pr32 == pr16).mean() > 0.97
