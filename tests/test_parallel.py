"""Multi-chip correctness on the 8-virtual-device CPU mesh
(SURVEY.md §4 item 4): sharded training runs, and sharded top-k selection
matches the unsharded oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnal_tpu.models.cnn import apply_cnn, init_cnn
from nnal_tpu.models.optim import make_optimizer
from nnal_tpu.models.specs import create_pw1
from nnal_tpu.parallel.mesh import make_mesh
from nnal_tpu.parallel.sharding import (
    make_sharded_train_step,
    param_partition_specs,
    shard_params,
    sharded_pool_topk,
)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
def test_mesh_shapes():
    mesh = make_mesh(8, model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(8, model_parallel=3)


@needs_8
def test_sharded_train_step_runs_and_matches_single():
    spec = create_pw1(2, 0.0, (9, 9, 1))
    params, _ = init_cnn(spec, jax.random.key(0))
    mesh = make_mesh(8, model_parallel=2)
    tx = make_optimizer("SGD", 1e-2)

    x = jax.random.normal(jax.random.key(1), (16, 9, 9, 1))
    y = jnp.asarray(np.eye(2)[np.arange(16) % 2], jnp.float32)

    # single-device oracle
    import optax

    def loss_fn(p):
        out = apply_cnn(spec, p, x, train=True, dropout_rng=jax.random.key(2))
        from nnal_tpu.models.losses import cross_entropy
        return cross_entropy(out.logits, y)

    loss0, grads = jax.value_and_grad(loss_fn)(params)
    upd, _ = tx.update(grads, tx.init(params), params)
    ref_params = optax.apply_updates(params, upd)

    sp = shard_params(jax.tree_util.tree_map(jnp.copy, params), mesh)
    step = make_sharded_train_step(spec, mesh, tx)
    new_params, _, loss = step(sp, tx.init(sp), x, y, jax.random.key(2))
    assert np.isclose(float(loss), float(loss0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(new_params["fc3"]["W"]),
                               np.asarray(ref_params["fc3"]["W"]),
                               rtol=1e-4, atol=1e-5)


@needs_8
def test_sharded_topk_matches_unsharded():
    mesh = make_mesh(8, model_parallel=1)
    n = 8 * 32
    scores_host = np.random.default_rng(0).normal(size=(n,)).astype(np.float32)

    def score_fn(params, x):
        return x[:, 0]

    topk = sharded_pool_topk(mesh, score_fn, k=7)
    patches = jnp.asarray(scores_host)[:, None]
    vals, idx = topk({}, patches)
    oracle = np.argsort(-scores_host, kind="stable")[:7]
    np.testing.assert_array_equal(np.sort(np.asarray(idx)),
                                  np.sort(oracle))
    np.testing.assert_allclose(np.sort(np.asarray(vals)),
                               np.sort(scores_host[oracle]), rtol=1e-6)


@needs_8
def test_partition_specs_tp_plan():
    spec = create_pw1(2, 0.0, (9, 9, 1))
    params, _ = init_cnn(spec, jax.random.key(0))
    specs = param_partition_specs(params)
    from jax.sharding import PartitionSpec as P

    assert specs["fc1"]["W"] == P(None, "model")
    assert specs["fc2"]["W"] == P("model", None)
    assert specs["conv1"]["W"] == P()


@needs_8
def test_graft_dryrun():
    import importlib.util, os, sys

    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    s = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(s)
    s.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 2)
    mod.dryrun_multichip(8)
