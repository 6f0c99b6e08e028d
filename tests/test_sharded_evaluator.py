"""Mesh-sharded GridPoolEvaluator (parallel/grid_sharded.py): the
config-driven multi-chip pool-scoring path (driver config #5).  Every
sweep must match the single-device evaluator BIT-FOR-BIT — selections
downstream depend on it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnal_tpu.data.io import synthetic_subject
from nnal_tpu.data.patches import pad_volumes
from nnal_tpu.models.cnn import init_cnn
from nnal_tpu.models.specs import create_pw1
from nnal_tpu.parallel.mesh import make_mesh
from nnal_tpu.scoring.grid_eval import GridPoolEvaluator

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


def _setup(z_chunk=4, shape=(14, 16, 8)):
    from nnal_tpu.parallel.grid_sharded import ShardedGridPoolEvaluator

    vols, mask = synthetic_subject(shape=shape, n_modalities=2, seed=1)
    patch_shape = (7, 7, 1)
    spec = create_pw1(2, 0.5, (7, 7, 2))
    params, _ = init_cnn(spec, jax.random.key(1))
    padded = pad_volumes(vols, patch_shape)
    mu = np.array([v.mean() for v in vols])
    sd = np.array([v.std() for v in vols])
    mesh = make_mesh(8, model_parallel=1)
    args = (spec, padded, mu, sd, patch_shape, shape)
    kw = dict(grid_spacing=2, z_chunk=z_chunk)
    ev1 = GridPoolEvaluator(*args, **kw)
    ev8 = ShardedGridPoolEvaluator(mesh, *args, **kw)
    return spec, params, ev1, ev8, shape


def _all_z_grid_vox(shape, g=2):
    """Grid voxels spanning EVERY z — routes evaluate() to the
    whole-volume sweep (rows confined to <= n_slabs//2 slabs would take
    the single-device slab path on both evaluators and the parity assert
    would be vacuous)."""
    s1, s2, s3 = shape
    gx, gy, z = np.meshgrid(np.arange(0, s1, g), np.arange(0, s2, g),
                            np.arange(s3), indexing="ij")
    return (gx.ravel() * s2 + gy.ravel()) * s3 + z.ravel()


@needs_8
def test_sharded_evaluate_bitwise():
    """Whole-grid posterior/prediction sweeps: identical per-chunk
    programs on each shard => bit-identical rows."""
    spec, params, ev1, ev8, shape = _setup()
    vox = _all_z_grid_vox(shape)
    for ops in (("posteriors",), ("posteriors", "prediction")):
        r1 = ev1.evaluate(params, vox, ops=ops)
        r8 = ev8.evaluate(params, vox, ops=ops)
        for op in ops:
            np.testing.assert_array_equal(r1[op], r8[op], err_msg=op)


@needs_8
def test_sharded_evaluate_mc_bitwise():
    """MC-dropout keys fold the GLOBAL chunk id on each shard, so MC
    sweeps are bitwise the single-device ones too."""
    spec, params, ev1, ev8, shape = _setup()
    vox = _all_z_grid_vox(shape)
    rng = jax.random.key(7)
    r1 = ev1.evaluate(params, vox, ops=("posteriors",), mc_rng=rng)
    r8 = ev8.evaluate(params, vox, ops=("posteriors",), mc_rng=rng)
    np.testing.assert_array_equal(r1["posteriors"], r8["posteriors"])


@needs_8
def test_sharded_evaluate_as_device_features():
    """The device-resident feature flow (core-set / rep-entropy) rides the
    sharded whole-volume sweep (as_device skips the slab routing);
    gathered rows match single-device."""
    spec, params, ev1, ev8, shape = _setup()
    s1, s2, s3 = shape
    vox = (np.arange(0, s1, 2)[:, None] * s2
           + np.arange(0, s2, 2)[None, :]).ravel() * s3 + 2
    f1 = ev1.evaluate(params, vox, ops=("feature_layer",), as_device=True)
    f8 = ev8.evaluate(params, vox, ops=("feature_layer",), as_device=True)
    np.testing.assert_array_equal(np.asarray(f1["feature_layer"]),
                                  np.asarray(f8["feature_layer"]))


@needs_8
def test_sharded_fim_sweep_parity():
    """fi's fused posterior+FIM sweep: selection-critical outputs
    (p1, uncertainty) bitwise; shrunk gradients are long f32 reduction
    chains whose last bits may reassociate across program shapes (same
    tolerance as the driver dryrun's production-path parity check)."""
    spec, params, ev1, ev8, _ = _setup()
    r1 = ev1.fim_sweep(params)
    r8 = ev8.fim_sweep(params)
    np.testing.assert_array_equal(r1["p1"], r8["p1"])
    np.testing.assert_array_equal(r1["uncertainty"], r8["uncertainty"])
    np.testing.assert_allclose(r1["shrunk"], r8["shrunk"],
                               rtol=1e-4, atol=1e-8)


@needs_8
def test_sharded_perturb_sweep_bitwise():
    """AU_4U perturbation divergences: keys fold global chunk ids."""
    spec, params, ev1, ev8, _ = _setup()
    rng = jax.random.key(3)
    d1 = ev1.perturb_sweep(params, rng)
    d8 = ev8.perturb_sweep(params, rng)
    np.testing.assert_array_equal(d1, d8)


@needs_8
@pytest.mark.slow
def test_engine_campaign_data_parallel_parity(tmp_path):
    """config key data_parallel=8: the engine's selections (query journal)
    are bit-identical to the single-device campaign for entropy AND fi."""
    from nnal_tpu.core.config import ExperimentConfig
    from nnal_tpu.core.journal import load_inds
    from nnal_tpu.engine.pw_experiment import PWExperiment

    vols, mask = synthetic_subject(shape=(20, 20, 8), n_modalities=1,
                                   seed=4, n_blobs=10)
    queries = {}
    for dp in (1, 8):
        qs = {}
        for method in ("entropy", "fi"):
            pars = {
                "model_name": "PW", "patch_shape": (7, 7, 1),
                "grid_spacing": 3, "k": 3, "B": 16, "ntb": 256, "b": 16,
                "epochs": 2, "learning_rate": 3e-4,
                "optimizer_name": "Adam", "dropout_rate": 0.0,
                "init_size": 12, "seed": 9, "data_parallel": dp,
            }
            expr = PWExperiment(str(tmp_path / f"dp{dp}_{method}"),
                                ExperimentConfig.from_pars(pars))
            expr.attach_subject(vols, mask)
            expr.prep_data()
            expr.add_method(method)
            expr.run_method(method, max_queries=6)
            qs[method] = np.sort(np.concatenate([
                load_inds(str(p)) for p in sorted(
                    (tmp_path / f"dp{dp}_{method}" / method
                     / "queries").glob("*"))]))
        queries[dp] = qs
    for method in ("entropy", "fi"):
        np.testing.assert_array_equal(queries[1][method],
                                      queries[8][method],
                                      err_msg=method)
