"""Multi-metric validation registries (reference eval_utils.py:16-102,
NN_extended.py:940-990), BN-statistics-only refresh (NN_extended.py:1059),
and the D3 finetuning-holder constructor (data_holders.py:360)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.data.holders import D3Holder, RegularHolder, get_dat_for_ft
from nnal_tpu.evaluation.registry import (
    MetricRegistry,
    eval_metrics,
    train_with_registries,
)
from nnal_tpu.models.cnn import apply_cnn, init_cnn
from nnal_tpu.models.optim import make_optimizer
from nnal_tpu.models.specs import create_densenet_2block, create_pw1
from nnal_tpu.models.train import (
    TrainState,
    make_train_step,
    update_bn_stats,
)


def _toy_data(rng, n=32):
    x = np.concatenate([rng.normal(size=(n // 2, 9, 9, 1)) - 2,
                        rng.normal(size=(n // 2, 9, 9, 1)) + 2]).astype(
                            np.float32)
    y = np.eye(2)[np.repeat([0, 1], n // 2)].astype(np.float32)
    return x, y


def test_eval_metrics_all_three():
    spec = create_pw1(2, 0.0, (9, 9, 1))
    params, _ = init_cnn(spec, jax.random.key(0))
    rng = np.random.default_rng(0)
    x, y = _toy_data(rng)

    def gen():
        return x, y

    vals = eval_metrics(spec, params, gen, iters=2,
                        metrics=("av_acc", "F1", "av_loss"))
    assert set(vals) == {"av_acc", "F1", "av_loss"}
    assert 0.0 <= vals["av_acc"] <= 1.0
    assert 0.0 <= vals["F1"] <= 1.0
    assert np.isfinite(vals["av_loss"])


def test_train_with_registries_streams_and_best(tmp_path):
    spec = create_pw1(2, 0.0, (9, 9, 1))
    params, _ = init_cnn(spec, jax.random.key(0))
    tx = make_optimizer("Adam", 1e-3)
    step = make_train_step(spec, tx)
    state = TrainState(params=params, opt_state=tx.init(params))
    rng = np.random.default_rng(1)
    x, y = _toy_data(rng)

    def train_gen():
        while True:
            yield x, y

    regs = [MetricRegistry(("av_acc", "av_loss"), lambda: (x, y), iters=1),
            MetricRegistry(("F1",), lambda: (x, y), iters=1)]
    save = str(tmp_path / "streams")
    state = train_with_registries(spec, state, step, train_gen(),
                                  step_limit=6, rng=jax.random.key(2),
                                  registries=regs, eval_every=3,
                                  save_path=save, track="av_acc")
    # per-registry metric streams <metric>_<i>.txt (reference
    # NN_extended.py:946-971)
    assert os.path.exists(os.path.join(save, "av_acc_0.txt"))
    assert os.path.exists(os.path.join(save, "av_loss_0.txt"))
    assert os.path.exists(os.path.join(save, "F1_1.txt"))
    assert len(np.atleast_1d(np.loadtxt(
        os.path.join(save, "av_acc_0.txt")))) == 3  # steps 0, 3, final
    # best-model tracking artifacts
    assert os.path.exists(os.path.join(save, "max_model_pars.npz"))
    assert os.path.exists(os.path.join(save, "max_valid_iter.txt"))

    # resume: histories reload from the txt streams
    state2 = TrainState(params=state.params,
                        opt_state=tx.init(state.params), step=6)
    regs2 = [MetricRegistry(("av_acc", "av_loss"), lambda: (x, y), iters=1),
             MetricRegistry(("F1",), lambda: (x, y), iters=1)]
    train_with_registries(spec, state2, step, train_gen(), step_limit=6,
                          rng=jax.random.key(2), registries=regs2,
                          eval_every=3, save_path=save, track="av_acc")
    assert len(regs2[0].history["av_acc"]) >= 4


def test_update_bn_stats_moves_only_bn():
    spec = create_densenet_2block(2, growth=4, depth=2,
                                  input_shape=(8, 8, 1))
    params, bn0 = init_cnn(spec, jax.random.key(0))
    rng = np.random.default_rng(3)
    data = (rng.normal(size=(8, 8, 8, 1)) * 3 + 1).astype(np.float32)

    bn1 = update_bn_stats(spec, params, bn0, lambda: data, iters=20)
    # running stats moved toward the data statistics
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        bn0, bn1)
    assert max(jax.tree_util.tree_leaves(moved)) > 0.1
    # eval-mode outputs change, parameters untouched by construction
    x = jnp.asarray(data[:2])
    o0 = np.asarray(apply_cnn(spec, params, x, state=bn0).logits)
    o1 = np.asarray(apply_cnn(spec, params, x, state=bn1).logits)
    assert not np.allclose(o0, o1)


def _subjects(rng, n=6, nz=8):
    out = []
    for _ in range(n):
        vols = [rng.normal(size=(10, 10, nz))]
        mask = (rng.random((10, 10, nz)) > 0.9).astype(np.float64)
        out.append((vols, mask))
    return out


def test_get_dat_for_ft():
    rng = np.random.default_rng(4)
    subs = _subjects(rng)
    holder = RegularHolder(subs, luv=(2, 2, 1), rng=rng)
    queried = [np.array([1, 3]), np.array([], np.int64)]
    new = get_dat_for_ft(holder, queried, keep_unlabeled=True)
    # 2 original labeled + 1 queried sub-volume
    assert len(new.labeled_inds) == 3
    qvols, qmask = new.load(new.labeled_inds[-1])
    assert qmask.shape[2] == 2        # exactly the queried slices
    # the queried slices match ground truth of the unlabeled subject
    src_vols, src_mask = holder.load(holder.unlabeled_inds[0])
    np.testing.assert_allclose(qmask, src_mask[:, :, [1, 3]])
    # keep_unlabeled: the remaining slices stay as an unlabeled subject
    assert len(new.unlabeled_inds) == 1
    uvols, umask = new.load(new.unlabeled_inds[0])
    assert umask.shape[2] == subs[0][1].shape[2] - 2
    # valid partition carries over
    assert len(new.valid_inds) == len(holder.valid_inds)


def test_get_dat_for_ft_d3_keeps_depth():
    rng = np.random.default_rng(5)
    holder = D3Holder(_subjects(rng), luv=(2, 2, 1), rng=rng, depth=3)
    new = get_dat_for_ft(holder, [np.arange(4), np.arange(2)])
    assert isinstance(new, D3Holder)
    assert new.depth == 3
    gen, _ = new.create_train_valid_gens(4, (8, 8), 2,
                                         np.random.default_rng(0))
    x, y = next(gen)
    assert x.shape[0] == 4
