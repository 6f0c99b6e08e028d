"""BN running statistics: threaded into eval, refreshed after training.

Review finding (r3): no engine or evaluator passed BN ``state`` into
``apply_cnn``, so BN-bearing specs (DenseNet, Tiramisu) ran inference on
each batch's OWN statistics — output depended on chunking, zero-row chunk
padding corrupted real samples, and the checkpointed bn_state was dead
weight.  Reference semantics (NN_extended.py:1059-1084 update_BN_stats +
is_training=False eval) are: refresh the moving averages after training,
evaluate on them.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.models.cnn import init_cnn
from nnal_tpu.models.specs import create_model
from nnal_tpu.models.train import update_bn_stats


def _dn_setup(seed=0):
    spec = create_model("DenseNet", nclass=4, dropout_rate=0.0,
                        input_shape=(16, 16, 1))
    params, bn = init_cnn(spec, jax.random.key(seed))
    assert bn, "DenseNet spec must carry BN state"
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(40, 16, 16, 1)).astype(np.float32)
    return spec, params, bn, X


def test_eval_mode_is_chunking_invariant_with_state():
    """With BN state passed, batched_forward output must not depend on the
    chunk size (the padded final chunk's zero rows used to shift the
    batch statistics and change real samples' posteriors)."""
    from nnal_tpu.scoring.cls_strategies import batched_forward

    spec, params, bn, X = _dn_setup()
    bn = update_bn_stats(spec, params, bn, lambda: X[:16], iters=3)
    p_whole = batched_forward(spec, params, X, 40, state=bn)["posteriors"]
    p_chunk = batched_forward(spec, params, X, 16, state=bn)["posteriors"]
    np.testing.assert_allclose(p_whole, p_chunk, atol=1e-5)
    # without state the batch-stats branch runs and chunking changes the
    # output — the failure mode this pins
    q_whole = batched_forward(spec, params, X, 40)["posteriors"]
    q_chunk = batched_forward(spec, params, X, 16)["posteriors"]
    assert not np.allclose(q_whole, q_chunk, atol=1e-5)


def test_fcn_inference_uses_bn_state():
    """FCNInference(bn_state=...) evaluates on the running stats: output
    is batch-size-invariant, and differs from the no-state batch-stats
    path."""
    from nnal_tpu.evaluation.inference import FCNInference
    from nnal_tpu.models.specs import create_tiramisu103

    spec = create_tiramisu103(2, input_shape=(16, 16, 1), growth=2,
                              depths=(2, 2))
    params, bn = init_cnn(spec, jax.random.key(1))
    assert bn
    rng = np.random.default_rng(1)
    slices = rng.normal(size=(6, 16, 16, 1)).astype(np.float32)
    bn = update_bn_stats(spec, params, bn, lambda: slices[:3], iters=3)
    inf2 = FCNInference(spec, batch=2, bn_state=bn)
    inf6 = FCNInference(spec, batch=6, bn_state=bn)
    p2 = inf2.segment(params, slices, "posteriors")
    p6 = inf6.segment(params, slices, "posteriors")
    np.testing.assert_allclose(p2, p6, atol=1e-5)
    p_none = FCNInference(spec, batch=2).segment(params, slices,
                                                 "posteriors")
    assert not np.allclose(p2, p_none, atol=1e-5)


def test_cls_engine_refreshes_bn_stats(tmp_path):
    """The classification engine must refresh bn_state after _retrain
    (it used to stay at init forever)."""
    from nnal_tpu.core.config import ExperimentConfig
    from nnal_tpu.engine.experiment import Experiment

    rng = np.random.default_rng(3)
    X = rng.normal(size=(120, 16, 16, 1)).astype(np.float32)
    y = rng.integers(0, 2, 120)
    cfg = ExperimentConfig.from_pars({
        "model_name": "DenseNet", "nclass": 2, "input_shape": (16, 16, 1),
        "k": 4, "B": 10, "ntb": 64, "b": 8, "epochs": 1, "MC_iters": 2,
        "init_size": 8, "test_ratio": 0.2, "seed": 5,
        "learning_rate": 1e-3, "optimizer_name": "Adam",
        "dropout_rate": 0.0})
    expr = Experiment(str(tmp_path / "bn"), cfg)
    expr.attach_data(X, y)
    run = expr.add_run()
    expr.add_method("entropy", run)
    expr.run_method("entropy", run, 4)
    import numpy.testing  # noqa: F401
    from nnal_tpu.models.checkpoint import load_checkpoint

    params, bn, _, _ = load_checkpoint(
        str(tmp_path / "bn" / str(run) / "entropy" / "curr_weights.npz"))
    spec = create_model("DenseNet", nclass=2, dropout_rate=0.0,
                        input_shape=(16, 16, 1))
    _, bn0 = init_cnn(spec, jax.random.key(0))
    moved = any(
        not np.allclose(np.asarray(bn[k]["mean"]),
                        np.asarray(bn0[k]["mean"]))
        for k in bn)
    assert moved, "bn_state never left its init values"
