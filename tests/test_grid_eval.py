"""GridPoolEvaluator (im2col sweep) vs the dynamic-slice oracle."""

import jax
import numpy as np

from nnal_tpu.data.io import synthetic_subject
from nnal_tpu.data.patches import pad_volumes
from nnal_tpu.data.samplers import generate_grid_samples
from nnal_tpu.models.cnn import init_cnn
from nnal_tpu.models.specs import create_pw1
from nnal_tpu.scoring.grid_eval import GridPoolEvaluator
from nnal_tpu.scoring.pool_eval import PoolEvaluator


def _setup(g=3, shape=(22, 26, 7), m=2):
    vols, mask = synthetic_subject(shape=shape, n_modalities=m, seed=0)
    patch_shape = (9, 9, 1)
    spec = create_pw1(2, 0.0, (9, 9, m))
    params, _ = init_cnn(spec, jax.random.key(0))
    mu = np.array([v.mean() for v in vols])
    sd = np.array([v.std() for v in vols])
    padded = pad_volumes(vols, patch_shape)
    grid_ev = GridPoolEvaluator(spec, padded, mu, sd, patch_shape,
                                shape, grid_spacing=g, z_chunk=3)
    slow_ev = PoolEvaluator(spec, padded, mu, sd, patch_shape, shape,
                            ntb=256)
    inds, _ = generate_grid_samples(shape, g, mask)
    return grid_ev, slow_ev, params, inds


def test_grid_sweep_matches_dynamic_slice():
    grid_ev, slow_ev, params, inds = _setup()
    for ops in [("posteriors",), ("prediction", "feature_layer")]:
        fast = grid_ev.evaluate(params, inds, ops)
        slow = slow_ev.evaluate(params, inds, ops)
        for op in ops:
            np.testing.assert_allclose(fast[op], slow[op],
                                       rtol=2e-4, atol=2e-5, err_msg=op)


def test_grid_subset_and_order():
    grid_ev, slow_ev, params, inds = _setup()
    sub = inds[::5][::-1].copy()          # arbitrary order subset
    fast = grid_ev.evaluate(params, sub, ("posteriors",))["posteriors"]
    slow = slow_ev.evaluate(params, sub, ("posteriors",))["posteriors"]
    np.testing.assert_allclose(fast, slow, rtol=2e-4, atol=2e-5)


def test_offgrid_falls_back():
    grid_ev, slow_ev, params, inds = _setup()
    off = np.array([1, 8, 17])  # not grid-aligned
    fast = grid_ev.evaluate(params, off, ("posteriors",))["posteriors"]
    slow = slow_ev.evaluate(params, off, ("posteriors",))["posteriors"]
    np.testing.assert_allclose(fast, slow, rtol=2e-4, atol=2e-5)


def test_grid_mc_dropout_deterministic_per_key():
    # needs a nonzero dropout rate for MC passes to differ
    vols, mask = synthetic_subject(shape=(22, 26, 7), n_modalities=2,
                                   seed=0)
    patch_shape = (9, 9, 1)
    spec = create_pw1(2, 0.4, (9, 9, 2))
    params, _ = init_cnn(spec, jax.random.key(0))
    mu = np.array([v.mean() for v in vols])
    sd = np.array([v.std() for v in vols])
    grid_ev = GridPoolEvaluator(spec, pad_volumes(vols, patch_shape), mu,
                                sd, patch_shape, (22, 26, 7),
                                grid_spacing=3, z_chunk=3)
    inds, _ = generate_grid_samples((22, 26, 7), 3, mask)
    a = grid_ev.evaluate(params, inds[:50], ("posteriors",),
                         mc_rng=jax.random.key(5))["posteriors"]
    b = grid_ev.evaluate(params, inds[:50], ("posteriors",),
                         mc_rng=jax.random.key(5))["posteriors"]
    c = grid_ev.evaluate(params, inds[:50], ("posteriors",),
                         mc_rng=jax.random.key(6))["posteriors"]
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)


def test_bf16_evaluator_close_to_f32():
    """bf16-storage sweeps (config.model.dtype='bfloat16') track the f32
    evaluator within bf16 resolution and preserve top-B selections."""
    import jax
    import jax.numpy as jnp
    from nnal_tpu.data.io import synthetic_subject
    from nnal_tpu.data.patches import pad_volumes
    from nnal_tpu.data.samplers import generate_grid_samples
    from nnal_tpu.models.cnn import init_cnn
    from nnal_tpu.models.specs import create_pw1
    from nnal_tpu.scoring.grid_eval import GridPoolEvaluator
    from nnal_tpu.scoring.uncertainty import binary_uncertainty_filter

    spec = create_pw1(2, 0.2, (9, 9, 1))
    params, _ = init_cnn(spec, jax.random.key(0))
    vols, mask = synthetic_subject(shape=(24, 24, 6), n_modalities=1,
                                   seed=3)
    padded = pad_volumes(vols, (9, 9, 1))
    inds, _ = generate_grid_samples(vols[0].shape, 3, mask)
    mu = np.array([vols[0].mean()])
    sd = np.array([vols[0].std()])
    kw = dict(grid_spacing=3, ntb=256)
    ev32 = GridPoolEvaluator(spec, padded, mu, sd, (9, 9, 1),
                             vols[0].shape, **kw)
    ev16 = GridPoolEvaluator(spec, padded, mu, sd, (9, 9, 1),
                             vols[0].shape, compute_dtype=jnp.bfloat16,
                             **kw)
    p32 = ev32.evaluate(params, inds, ("posteriors",))["posteriors"]
    p16 = ev16.evaluate(params, inds, ("posteriors",))["posteriors"]
    assert np.abs(p32 - p16).max() < 0.05
    B = 16
    t32 = np.asarray(binary_uncertainty_filter(p32, B))
    t16 = np.asarray(binary_uncertainty_filter(p16, B))
    assert len(set(t32.tolist()) & set(t16.tolist())) >= B - 2


def test_fim_sweep_matches_fused_scorer():
    """fim_sweep (whole-grid single-dispatch diag-FIM) matches per-chunk
    pool_score_fused on the same grid order."""
    import jax
    from nnal_tpu.data.io import synthetic_subject
    from nnal_tpu.data.patches import pad_volumes
    from nnal_tpu.models.cnn import init_cnn
    from nnal_tpu.models.specs import create_pw1
    from nnal_tpu.ops.scoring_fused import pool_score_fused
    from nnal_tpu.scoring.grid_eval import GridPoolEvaluator

    spec = create_pw1(2, 0.2, (9, 9, 1))
    params, _ = init_cnn(spec, jax.random.key(0))
    vols, _ = synthetic_subject(shape=(20, 20, 4), n_modalities=1, seed=1)
    padded = pad_volumes(vols, (9, 9, 1))
    mu = np.array([vols[0].mean()])
    sd = np.array([vols[0].std()])
    ev = GridPoolEvaluator(spec, padded, mu, sd, (9, 9, 1), vols[0].shape,
                          grid_spacing=2, z_chunk=2)
    res = ev.fim_sweep(params)
    n = ev.nx * ev.ny * ev.nz
    assert res["p1"].shape == (n,)
    assert res["shrunk"].shape[0] == n
    # cross-check one z-chunk against the fused scorer directly
    import jax.numpy as jnp
    import jax.lax as lax
    block = ev._slices[:2]
    patches = lax.conv_general_dilated_patches(
        block, filter_shape=(9, 9), window_strides=(2, 2),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    zc, nx, ny, _ = patches.shape
    x = patches.reshape(zc * nx * ny, 1, 9, 9).transpose(0, 2, 3, 1)
    x = (x - jnp.asarray(mu, jnp.float32)) / jnp.asarray(sd, jnp.float32)
    ref = pool_score_fused(spec, params, x, True, None)
    np.testing.assert_allclose(res["p1"][:zc * nx * ny],
                               np.asarray(ref["p1"]), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(res["shrunk"][:zc * nx * ny],
                               np.asarray(ref["shrunk"]), rtol=1e-4,
                               atol=1e-6)


def test_slab_restricted_rows_match_full_sweep():
    """Rows confined to a few slices take the slab-restricted path (only
    the touched z-slabs are swept) and must equal the one-dispatch
    whole-volume sweep bitwise, including wide ops and MC keys."""
    grid_ev, _, params, inds = _setup()
    s3 = grid_ev.orig_shape[2]
    sub = inds[(inds % s3) <= 1]          # slices 0-1 only (slab 0)
    sub = sub[::-1].copy()                # arbitrary order
    for mc in (None, jax.random.key(9)):
        slab = grid_ev.evaluate(params, sub,
                                ("posteriors", "feature_layer"), mc_rng=mc)
        full = grid_ev.evaluate(params, sub,
                                ("posteriors", "feature_layer"), mc_rng=mc,
                                as_device=True)
        for op in ("posteriors", "feature_layer"):
            np.testing.assert_array_equal(slab[op], np.asarray(full[op]))


def test_offgrid_dense_route_matches_oracle():
    """A large off-grid index set routes through the stride-1 slab sweep
    and must match the dynamic-slice oracle within conv-extraction
    tolerance; tiny sets stay on the gather path."""
    grid_ev, slow_ev, params, _ = _setup()
    s1, s2, s3 = grid_ev.orig_shape
    rng = np.random.RandomState(0)
    n = s1 * s2 * 2                       # dense enough for the heuristic
    off = (rng.randint(0, s1, n) * s2 + rng.randint(0, s2, n)) * s3 \
        + rng.randint(0, 2, n)            # clustered on slices 0-1
    off[0] = (1 * s2 + 1) * s3            # guarantee an off-grid voxel
    assert grid_ev._grid_rows(off) is None
    assert grid_ev._offgrid_dense_worthwhile(off)
    fast = grid_ev.evaluate(params, off, ("posteriors",))["posteriors"]
    slow = slow_ev.evaluate(params, off, ("posteriors",))["posteriors"]
    np.testing.assert_allclose(fast, slow, rtol=2e-4, atol=2e-5)
    assert not grid_ev._offgrid_dense_worthwhile(off[:3])


def test_full_volume_patchwise_single_sweep():
    """full_slice_patchwise batches all slices into one evaluate call; the
    stacked volume must equal the slow per-voxel oracle."""
    from nnal_tpu.evaluation.inference import full_volume_patchwise
    from nnal_tpu.data.indexing import expand_raveled_inds

    grid_ev, slow_ev, params, _ = _setup(shape=(14, 16, 5))
    vol = full_volume_patchwise(grid_ev, params, op="posteriors")
    s = grid_ev.orig_shape
    assert vol.shape == s
    z = 2
    inds3d = expand_raveled_inds(np.arange(s[0] * s[1]), z, 2, s)
    slow = slow_ev.evaluate(params, inds3d,
                            ("posteriors",))["posteriors"]
    np.testing.assert_allclose(vol[:, :, z].ravel(), slow,
                               rtol=2e-4, atol=2e-5)


def test_d3_grid_sweep_matches_dynamic_slice():
    """Multi-slice patches (d3=3) ride the im2col sweep via z-neighbor
    channel stacking and must match the dynamic-slice gather oracle —
    on-grid rows, slab-restricted subsets, and the fused FIM sweep."""
    from nnal_tpu.ops.scoring_fused import pool_score_fused
    from nnal_tpu.data.patches import gather_patches_normalized

    shape, m, g, d3 = (20, 22, 9), 2, 3, 3
    vols, mask = synthetic_subject(shape=shape, n_modalities=m, seed=2)
    patch_shape = (9, 9, d3)
    spec = create_pw1(2, 0.0, (9, 9, m * d3))
    params, _ = init_cnn(spec, jax.random.key(0))
    mu = np.array([v.mean() for v in vols])
    sd = np.array([v.std() for v in vols])
    padded = pad_volumes(vols, patch_shape)
    grid_ev = GridPoolEvaluator(spec, padded, mu, sd, patch_shape, shape,
                                grid_spacing=g, z_chunk=2)
    slow_ev = PoolEvaluator(spec, padded, mu, sd, patch_shape, shape,
                            ntb=256)
    inds, _ = generate_grid_samples(shape, g, mask)

    # the stacked channels reproduce the 3D gather bitwise: extract the
    # full grid from the channel stack exactly as the sweep does and
    # compare the gathered rows' patches value-for-value
    from nnal_tpu.scoring.grid_eval import extract_normalize

    x_gather = gather_patches_normalized(padded, jax.numpy.asarray(inds[:8]),
                                         mu, sd, patch_shape, shape)
    rows = np.asarray(grid_ev._grid_rows(inds[:8]))
    x_sweep = extract_normalize(grid_ev._slices, 9, 9, g,
                                grid_ev._mu_c, grid_ev._sd_c)
    np.testing.assert_array_equal(np.asarray(x_sweep)[rows],
                                  np.asarray(x_gather))
    fast = grid_ev.evaluate(params, inds, ("posteriors", "feature_layer"))
    slow = slow_ev.evaluate(params, inds, ("posteriors", "feature_layer"))
    for op in ("posteriors", "feature_layer"):
        np.testing.assert_allclose(fast[op], slow[op], rtol=2e-4,
                                   atol=2e-5, err_msg=op)

    # slab-restricted subset == whole sweep (bitwise)
    s3 = shape[2]
    sub = inds[(inds % s3) <= 1][::-1].copy()
    a = grid_ev.evaluate(params, sub, ("posteriors",))
    b = grid_ev.evaluate(params, sub, ("posteriors",), as_device=True)
    np.testing.assert_array_equal(a["posteriors"],
                                  np.asarray(b["posteriors"]))

    # fused FIM sweep == pool_score_fused on gathered patches
    sweep = grid_ev.fim_sweep(params)
    rows_all = grid_ev._grid_rows(inds)
    ref = pool_score_fused(spec, params,
                           gather_patches_normalized(
                               padded, jax.numpy.asarray(inds[:32]), mu, sd,
                               patch_shape, shape), True, None)
    np.testing.assert_allclose(sweep["p1"][rows_all[:32]],
                               np.asarray(ref["p1"]), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(sweep["shrunk"][rows_all[:32]],
                               np.asarray(ref["shrunk"]), rtol=5e-3,
                               atol=5e-5)


def test_even_d3_delegates_to_gather_path():
    """Even patch depths can't sweep (the gather's dynamic_slice clamps
    the last z's window, which a channel stack can't reproduce) — the
    evaluator must construct fine and delegate every evaluate to the
    exact dynamic-slice path."""
    shape, m, d3 = (16, 16, 6), 1, 2
    vols, mask = synthetic_subject(shape=shape, n_modalities=m, seed=1)
    patch_shape = (7, 7, d3)
    spec = create_pw1(2, 0.0, (7, 7, m * d3))
    params, _ = init_cnn(spec, jax.random.key(0))
    mu = np.array([v.mean() for v in vols])
    sd = np.array([v.std() for v in vols])
    padded = pad_volumes(vols, patch_shape)
    grid_ev = GridPoolEvaluator(spec, padded, mu, sd, patch_shape, shape,
                                grid_spacing=2, z_chunk=2)
    assert not grid_ev._sweep_ok
    slow_ev = PoolEvaluator(spec, padded, mu, sd, patch_shape, shape,
                            ntb=128)
    inds, _ = generate_grid_samples(shape, 2, mask)
    a = grid_ev.evaluate(params, inds[:40], ("posteriors",))["posteriors"]
    b = slow_ev.evaluate(params, inds[:40], ("posteriors",))["posteriors"]
    np.testing.assert_array_equal(a, b)


def test_loss_op_chunk_mean_semantics():
    """The 'loss' op reproduces the reference's broadcast-assignment:
    every index in a chunk gets that chunk's MEAN CE vs the mask labels
    (PW_NN.py:485-535), with the ragged tail averaged over its true
    length only."""
    import jax.numpy as jnp

    vols, mask = synthetic_subject(shape=(22, 26, 7), n_modalities=2,
                                   seed=0)
    patch_shape = (9, 9, 1)
    spec = create_pw1(2, 0.0, (9, 9, 2))
    params, _ = init_cnn(spec, jax.random.key(0))
    mu = np.array([v.mean() for v in vols])
    sd = np.array([v.std() for v in vols])
    padded = pad_volumes(vols, patch_shape)
    ev = PoolEvaluator(spec, padded, mu, sd, patch_shape, (22, 26, 7),
                       ntb=64)
    rng = np.random.default_rng(0)
    inds = rng.choice(22 * 26 * 7, size=150, replace=False)  # ragged tail

    res = ev.evaluate(params, inds, ("loss", "posteriors"), mask=mask)
    assert set(res) == {"loss", "posteriors"}

    # oracle: per-sample CE -> chunk means
    from nnal_tpu.data.batching import make_onehot
    from nnal_tpu.data.patches import (gather_labels,
                                       gather_patches_normalized)
    from nnal_tpu.models.cnn import apply_cnn

    expect = np.empty(len(inds))
    for lo in range(0, len(inds), 64):
        chunk = inds[lo:lo + 64]
        x = gather_patches_normalized(padded, jnp.asarray(chunk), mu, sd,
                                      patch_shape, (22, 26, 7))
        y = make_onehot(np.asarray(gather_labels(mask, chunk, (22, 26, 7)),
                                   np.int64), 2)
        logp = jax.nn.log_softmax(apply_cnn(spec, params, x).logits, -1)
        ce = -np.sum(y * np.asarray(logp), axis=-1)
        expect[lo:lo + len(chunk)] = ce.mean()
    np.testing.assert_allclose(res["loss"], expect, rtol=1e-5, atol=1e-6)

    # grid evaluator routes 'loss' through the same path
    gev = GridPoolEvaluator(spec, padded, mu, sd, patch_shape, (22, 26, 7),
                            grid_spacing=3, z_chunk=3, ntb=64)
    res_g = gev.evaluate(params, inds, ("loss",), mask=mask)
    np.testing.assert_allclose(res_g["loss"], expect, rtol=1e-5, atol=1e-6)
