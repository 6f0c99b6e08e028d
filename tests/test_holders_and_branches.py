import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.data.holders import (
    D3Holder,
    RegularHolder,
    lesion_patch_gen,
    prepare_batch_brvol,
)
from nnal_tpu.data.io import synthetic_subject
from nnal_tpu.data.stats import StreamingHistogram
from nnal_tpu.models.branches import (
    apply_with_branch,
    branch_input_shape,
    init_branch,
    replicate_params,
)
from nnal_tpu.models.cnn import init_cnn
from nnal_tpu.models.specs import CNNSpec, Layer, create_alexnet, create_pw1


def _subjects(n, shape=(20, 20, 6), seed0=0):
    return [synthetic_subject(shape=shape, n_modalities=2, seed=seed0 + i)
            for i in range(n)]


def test_prepare_batch_brvol_2d():
    rng = np.random.default_rng(0)
    subs = _subjects(3)
    imgs = [s[0] for s in subs]
    masks = [s[1] for s in subs]
    x, y = prepare_batch_brvol(imgs, masks, (16, 16), rng,
                               one_hot_channels=2,
                               labeled_indic=np.array([1, 1, 0]))
    assert x.shape == (3, 16, 16, 2)
    assert y.shape == (3, 16, 16, 2)
    assert np.isnan(y[2]).all()            # unlabeled sample
    valid = ~np.isnan(y[0]).any(-1)
    np.testing.assert_allclose(y[0][valid].sum(-1), 1.0)  # one-hot rows


def test_prepare_batch_brvol_3d():
    rng = np.random.default_rng(1)
    subs = _subjects(2)
    x, y = prepare_batch_brvol([s[0] for s in subs],
                               [s[1] for s in subs], (16, 16), rng,
                               one_hot_channels=2, depth=3)
    assert x.shape == (2, 16, 16, 3, 2)


def test_regular_holder_splits_and_gens():
    rng = np.random.default_rng(2)
    holder = RegularHolder(_subjects(6), luv=(2, 2, 1), rng=rng)
    all_inds = (holder.labeled_inds + holder.unlabeled_inds
                + holder.valid_inds + holder.test_inds)
    assert sorted(all_inds) == list(range(6))
    assert len(holder.labeled_inds) == 2
    assert len(holder.test_inds) == 1

    train_gen, valid_gen = holder.create_train_valid_gens(
        4, (16, 16), 2, rng, n_labeled=2)
    x, y = next(train_gen)
    assert x.shape == (4, 16, 16, 2)
    # exactly 2 labeled (non-NaN) samples per batch
    lab = [not np.isnan(y[i]).all() for i in range(4)]
    assert sum(lab) == 2
    vx, vy = next(valid_gen())
    assert vx.shape[0] == 1


def test_d3_holder():
    rng = np.random.default_rng(3)
    holder = D3Holder(_subjects(3, shape=(16, 16, 9)), luv=(1, 1, 1),
                      rng=rng, depth=3)
    train_gen, _ = holder.create_train_valid_gens(2, (12, 12), 2, rng,
                                                  n_labeled=1)
    x, y = next(train_gen)
    assert x.shape == (2, 12, 12, 3, 2)


def test_label_remap_and_combine():
    rng = np.random.default_rng(4)
    subs = _subjects(2)
    h1 = RegularHolder(subs, luv=(1, 0, 0), rng=rng,
                       label_map={1: 3})
    vols, mask = h1.load(0)
    vals = set(np.unique(mask[~np.isnan(mask)]))
    assert vals <= {0.0, 3.0}
    h2 = RegularHolder(_subjects(2, seed0=5), luv=(1, 0, 0), rng=rng)
    h1.combine(h2)
    assert len(h1.subjects) == 4
    assert max(h1.labeled_inds) >= 2


def test_lesion_patch_gen():
    rng = np.random.default_rng(5)
    subs = _subjects(2, shape=(20, 20, 6))
    legal = []
    for vols, mask in subs:
        x, y, z = np.where(np.nan_to_num(mask) > 0)
        keep = (x > 2) & (x < 17) & (y > 2) & (y < 17)
        legal.append((x[keep], y[keep], z[keep]))
    gen = lesion_patch_gen([s[0] for s in subs], [s[1] for s in subs],
                           legal, square_patch_size=5, patch_num=4,
                           rng=rng)
    patches, sub_inds, coords = next(gen)
    assert patches.shape == (4, 5, 5, 2)
    assert len(coords) == 4


def test_streaming_histogram():
    h = StreamingHistogram(0, 1, bins=10)
    rng = np.random.default_rng(0)
    for _ in range(5):
        h.update(rng.random(1000))
    assert h.counts.sum() == 5000
    widths = np.diff(h.edges)
    assert np.isclose(float((h.density * widths).sum()), 1.0)


def test_branches():
    trunk = create_pw1(2, 0.0, (9, 9, 1))           # probe on layer 4
    shape = branch_input_shape(trunk, 4)
    assert len(shape) == 3
    branch = CNNSpec("aux", (Layer("bfc", "fc", 3, (), (), "VALID", "M"),),
                     shape, 3)
    bp, _ = init_branch(branch, jax.random.key(0))
    tp, _ = init_cnn(trunk, jax.random.key(1))
    t_out, b_out = apply_with_branch(trunk, branch, tp, bp,
                                     jnp.ones((2, 9, 9, 1)), 4)
    assert t_out.logits.shape == (2, 2)
    assert b_out.logits.shape == (2, 3)
    rep = replicate_params(tp)
    rep["fc3"]["W"] = rep["fc3"]["W"] + 1
    assert not np.allclose(np.asarray(rep["fc3"]["W"]),
                           np.asarray(tp["fc3"]["W"]))


def test_alexnet_spec():
    spec = create_alexnet(10)
    params, _ = init_cnn(spec, jax.random.key(0))
    from nnal_tpu.models.cnn import apply_cnn

    out = apply_cnn(spec, params, jnp.ones((1, 227, 227, 3)))
    assert out.logits.shape == (1, 10)


def test_supix_strategy_e2e(tmp_path):
    from nnal_tpu.cli.expr_handler import do_expr

    overrides = ("patch_shape=[9,9,1],grid_spacing=4,k=2,B=16,ntb=256,"
                 "b=32,epochs=1,init_size=6")
    res = do_expr(str(tmp_path / "supix"), "SuPix", 6, overrides,
                  synthetic=True)
    assert res["n_queries"] >= 6
