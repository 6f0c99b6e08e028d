"""Sharded im2col grid sweep vs unsharded grid evaluator."""

import jax
import numpy as np
import pytest

from nnal_tpu.data.io import synthetic_subject
from nnal_tpu.data.patches import pad_volumes
from nnal_tpu.data.samplers import generate_grid_samples
from nnal_tpu.models.cnn import init_cnn
from nnal_tpu.models.specs import create_pw1
from nnal_tpu.parallel.mesh import make_mesh
from nnal_tpu.parallel.pool_sharded import (
    grid_row_to_voxel,
    make_sharded_grid_selector,
)
from nnal_tpu.scoring.grid_eval import GridPoolEvaluator

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
def test_sharded_grid_matches_unsharded():
    mesh = make_mesh(8, model_parallel=1)
    shape = (20, 24, 11)   # odd z to exercise padding
    g = 2
    patch_shape = (9, 9, 1)
    vols, _ = synthetic_subject(shape=shape, n_modalities=2, seed=0)
    spec = create_pw1(2, 0.0, (9, 9, 2))
    params, _ = init_cnn(spec, jax.random.key(0))
    padded = pad_volumes(vols, patch_shape)
    mu = np.array([v.mean() for v in vols])
    sd = np.array([v.std() for v in vols])

    k = 9
    run = make_sharded_grid_selector(spec, mesh, patch_shape, shape, g, k)
    vals, rows = run(params, padded, mu, sd)
    voxels = grid_row_to_voxel(rows, shape, g)

    # unsharded oracle over the full grid
    ev = GridPoolEvaluator(spec, padded, mu, sd, patch_shape, shape,
                           grid_spacing=g, z_chunk=4)
    inds = generate_grid_samples(shape, g)
    p1 = ev.evaluate(params, inds, ("posteriors",))["posteriors"]
    oracle_pos = np.argsort(np.abs(p1 - 0.5), kind="stable")[:k]
    oracle_vox = inds[oracle_pos]
    np.testing.assert_array_equal(np.sort(voxels), np.sort(oracle_vox))


def test_grid_row_roundtrip():
    shape = (12, 14, 5)
    g = 3
    inds = generate_grid_samples(shape, g)
    # row ids in z-major grid order are exactly 0..n-1 for the full grid
    from nnal_tpu.scoring.grid_eval import GridPoolEvaluator

    x, y, z = np.unravel_index(inds, shape)
    nx = len(range(0, shape[0], g))
    ny = len(range(0, shape[1], g))
    rows = (z * nx + x // g) * ny + y // g
    back = grid_row_to_voxel(rows, shape, g)
    np.testing.assert_array_equal(back, inds)


@needs_8
def test_sharded_dense_segmenter_matches_single_device():
    """Mesh-sharded whole-volume serving == the single-device batched
    full_volume_patchwise sweep (same stride-1 im2col extraction, so only
    batch-tiling reduction order can differ)."""
    from nnal_tpu.evaluation.inference import full_volume_patchwise
    from nnal_tpu.parallel.pool_sharded import make_sharded_dense_segmenter

    mesh = make_mesh(8, model_parallel=1)
    shape = (14, 16, 11)   # odd z to exercise shard padding
    patch_shape = (7, 7, 1)
    vols, _ = synthetic_subject(shape=shape, n_modalities=2, seed=0)
    spec = create_pw1(2, 0.0, (7, 7, 2))
    params, _ = init_cnn(spec, jax.random.key(0))
    padded = pad_volumes(vols, patch_shape)
    mu = np.array([v.mean() for v in vols])
    sd = np.array([v.std() for v in vols])

    run = make_sharded_dense_segmenter(spec, mesh, patch_shape, shape,
                                       op="posteriors")
    vol_sh = run(params, padded, mu, sd)
    assert vol_sh.shape == shape

    ev = GridPoolEvaluator(spec, padded, mu, sd, patch_shape, shape,
                           grid_spacing=2, z_chunk=4)
    vol_1 = full_volume_patchwise(ev, params, op="posteriors")
    np.testing.assert_allclose(vol_sh, vol_1, rtol=1e-5, atol=1e-6)

    pred_sh = make_sharded_dense_segmenter(spec, mesh, patch_shape, shape,
                                           op="prediction")(params, padded,
                                                            mu, sd)
    assert pred_sh.shape == shape
    np.testing.assert_array_equal(
        pred_sh, full_volume_patchwise(ev, params, op="prediction"))


@needs_8
def test_sharded_dense_segmenter_quantized():
    """int8-quantized pytrees (models/quant.py) serve through the
    mesh-sharded dense segmenter too: each shard's sweep hits the
    W_q branch of _main_op, and the sharded result matches the
    single-device quantized sweep exactly (same extraction, same ops)."""
    from nnal_tpu.evaluation.inference import full_volume_patchwise
    from nnal_tpu.models.quant import quantize_params
    from nnal_tpu.parallel.pool_sharded import make_sharded_dense_segmenter

    mesh = make_mesh(8, model_parallel=1)
    shape = (14, 16, 8)
    patch_shape = (7, 7, 1)
    vols, _ = synthetic_subject(shape=shape, n_modalities=2, seed=1)
    spec = create_pw1(2, 0.0, (7, 7, 2))
    params, _ = init_cnn(spec, jax.random.key(1))
    qp = quantize_params(spec, params)
    padded = pad_volumes(vols, patch_shape)
    mu = np.array([v.mean() for v in vols])
    sd = np.array([v.std() for v in vols])

    run = make_sharded_dense_segmenter(spec, mesh, patch_shape, shape,
                                       op="posteriors")
    vol_q = run(qp, padded, mu, sd)
    assert vol_q.shape == shape

    ev = GridPoolEvaluator(spec, padded, mu, sd, patch_shape, shape,
                           grid_spacing=2, z_chunk=4)
    vol_1 = full_volume_patchwise(ev, qp, op="posteriors")
    np.testing.assert_allclose(vol_q, vol_1, rtol=1e-5, atol=1e-6)
    # and it stays close to the float serving result
    vol_f = run(params, padded, mu, sd)
    assert float(np.max(np.abs(vol_q - vol_f))) < 0.25
