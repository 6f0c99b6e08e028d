"""Sharded pool selection (driver config #5) vs single-device oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnal_tpu.data.io import synthetic_subject
from nnal_tpu.data.patches import pad_volumes
from nnal_tpu.models.cnn import apply_cnn, init_cnn
from nnal_tpu.models.specs import create_pw1
from nnal_tpu.parallel.mesh import make_mesh
from nnal_tpu.parallel.pool_sharded import make_sharded_pool_selector

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
def test_sharded_selection_matches_oracle():
    mesh = make_mesh(8, model_parallel=1)
    spec = create_pw1(2, 0.0, (9, 9, 2))
    params, _ = init_cnn(spec, jax.random.key(0))
    vols, mask = synthetic_subject(shape=(24, 24, 8), n_modalities=2,
                                   seed=0)
    patch_shape = (9, 9, 1)
    padded = pad_volumes(vols, patch_shape)
    mu = np.array([v.mean() for v in vols])
    sd = np.array([v.std() for v in vols])
    pool = np.random.default_rng(1).choice(
        np.prod(vols[0].shape), size=333, replace=False).astype(np.int64)

    k = 11
    run = make_sharded_pool_selector(spec, mesh, patch_shape,
                                     vols[0].shape, k)
    vals, gpos = run(params, padded, mu, sd, pool)
    assert len(gpos) == k

    # oracle: unsharded scoring
    from nnal_tpu.data.patches import gather_patches_normalized

    x = gather_patches_normalized(padded, jnp.asarray(pool), mu, sd,
                                  patch_shape, vols[0].shape)
    p1 = np.asarray(apply_cnn(spec, params, x).posteriors[:, 1])
    oracle = np.argsort(np.abs(p1 - 0.5), kind="stable")[:k]
    # positions index the padded vector, but padding is at the tail and
    # masked out, so valid positions map 1:1 onto the pool
    np.testing.assert_array_equal(np.sort(gpos), np.sort(oracle))


def test_surgery_aleatoric_extension():
    from nnal_tpu.models.specs import with_aleatoric_head
    from nnal_tpu.models.surgery import extend_params_to_aleatoric

    spec = create_pw1(2, 0.0, (9, 9, 1))
    params, _ = init_cnn(spec, jax.random.key(0))
    ext = extend_params_to_aleatoric(params, "fc3")
    assert ext["fc3"]["W"].shape[-1] == 4
    np.testing.assert_array_equal(ext["fc3"]["W"][:, :2],
                                  np.asarray(params["fc3"]["W"]))
    # extended params run under the aleatoric spec and reproduce the
    # original posteriors (sigma half is zero)
    al_spec = with_aleatoric_head(spec)
    x = jnp.ones((2, 9, 9, 1))
    base = apply_cnn(spec, params, x).posteriors
    ext_j = {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
             for k, v in ext.items()}
    out = apply_cnn(al_spec, ext_j, x)
    np.testing.assert_allclose(np.asarray(out.posteriors),
                               np.asarray(base), rtol=1e-5)
    assert np.allclose(np.asarray(out.log_sigma), 0.0)
