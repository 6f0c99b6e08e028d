"""Mixed-precision training (``model.train_dtype = bfloat16``): bf16
forward/backward on the MXU with f32 master params + optimizer state.
TPU-native addition — the reference's TF1 training is f32-only."""

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.core.config import ExperimentConfig
from nnal_tpu.data.io import synthetic_subject
from nnal_tpu.engine.pw_experiment import PWExperiment
from nnal_tpu.models.cnn import init_cnn
from nnal_tpu.models.optim import make_optimizer
from nnal_tpu.models.specs import create_pw1
from nnal_tpu.models.train import (
    build_batch_index_matrix,
    init_train_state,
    make_scanned_finetune,
    make_train_step,
)


def _flat(tree):
    return np.concatenate([np.asarray(v, np.float64).ravel()
                           for v in jax.tree_util.tree_leaves(tree)])


def _problem(n=32, seed=0):
    spec = create_pw1(2, 0.0, (9, 9, 1))
    params, _ = init_cnn(spec, jax.random.key(seed))
    x = jax.random.normal(jax.random.key(seed + 1), (n, 9, 9, 1))
    y = jnp.asarray(np.eye(2)[np.arange(n) % 2], jnp.float32)
    return spec, params, x, y


def test_train_step_bf16_master_params_stay_f32():
    """One bf16-compute SGD step: the updated params stay float32 (master
    weights), the loss is finite and within bf16 tolerance of the f32
    step's, and the update direction agrees (the cast sits inside the
    differentiated function, so gradients transpose back to f32)."""
    spec, params, x, y = _problem()
    tx = make_optimizer("SGD", 1e-2)
    results = {}
    for name, cd in (("f32", None), ("bf16", jnp.bfloat16)):
        p0 = jax.tree_util.tree_map(jnp.copy, params)
        step = make_train_step(spec, tx, compute_dtype=cd)
        p1, _, loss = step(p0, tx.init(params), x, y, jax.random.key(1),
                           jnp.asarray(0))
        for leaf in jax.tree_util.tree_leaves(p1):
            assert leaf.dtype == jnp.float32, leaf.dtype
        results[name] = (float(loss), _flat(p1))
    l32, p32 = results["f32"]
    l16, p16 = results["bf16"]
    assert np.isfinite(l16)
    np.testing.assert_allclose(l16, l32, rtol=2e-2)
    base = _flat(params)
    d32, d16 = p32 - base, p16 - base
    cos = np.dot(d32, d16) / (np.linalg.norm(d32) * np.linalg.norm(d16))
    assert cos > 0.95, cos


def test_scanned_finetune_bf16_learns():
    """The bf16 scanned finetune decreases the loss like the f32 one and
    keeps f32 master params; padded no-op steps still leave params
    untouched (the jnp.where guard operates on f32 trees either way)."""
    spec, params, x, y = _problem(n=48, seed=3)
    tx = make_optimizer("Adam", 1e-3)
    idx_mat, w_mat = build_batch_index_matrix(48, 16, 4,
                                              np.random.RandomState(0),
                                              bucket=64)
    cw = jnp.ones((2,), jnp.float32)
    finals = {}
    for name, cd in (("f32", None), ("bf16", jnp.bfloat16)):
        run = make_scanned_finetune(spec, tx, batch_size=16,
                                    compute_dtype=cd)
        p, o, losses = run(jax.tree_util.tree_map(jnp.copy, params),
                           tx.init(params), x, y, jnp.asarray(idx_mat),
                           jnp.asarray(w_mat), cw, jax.random.key(2))
        losses = np.asarray(losses)
        real = losses[np.asarray(w_mat).sum(1) > 0]
        assert real[-1] < real[0], (name, real[0], real[-1])
        for leaf in jax.tree_util.tree_leaves(p):
            assert leaf.dtype == jnp.float32
        finals[name] = real[-1]
    # same trajectory up to bf16 rounding drift
    np.testing.assert_allclose(finals["bf16"], finals["f32"], rtol=0.2)


def test_engine_train_dtype_config(tmp_path):
    """``train_dtype=bfloat16`` drives the engine finetune end-to-end: the
    scanned runner is built with the bf16 compute dtype (cache key differs
    from f32) and the finetuned params stay f32 and finite."""
    vols, mask = synthetic_subject(shape=(24, 24, 8), n_modalities=1,
                                   seed=2, n_blobs=10)
    pars = {
        "model_name": "PW", "patch_shape": (9, 9, 1), "grid_spacing": 5,
        "k": 3, "B": 12, "ntb": 256, "b": 16, "epochs": 2,
        "learning_rate": 3e-4, "optimizer_name": "Adam",
        "dropout_rate": 0.0, "init_size": 32, "seed": 5,
        "train_dtype": "bfloat16",
    }
    expr = PWExperiment(str(tmp_path / "mp"), ExperimentConfig.from_pars(pars))
    expr.attach_subject(vols, mask)
    expr.prep_data()
    j = expr.add_method("entropy")
    spec = expr.build_model()
    from nnal_tpu.models.checkpoint import load_checkpoint

    params, _, _, _ = load_checkpoint(j.path("curr_weights.npz"))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state, tx = init_train_state(spec, params, "Adam", 3e-4)
    train_inds, _ = j.membership()
    state = expr.finetune(spec, (state, tx), train_inds)
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(leaf)))
    (ck,) = expr._ft_runners.keys()
    # the key also carries the MT-SSL config tuple since r4; check the
    # compute dtype by membership rather than position
    assert jnp.bfloat16 in ck, ck
