"""Pallas kernels vs XLA oracles (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnal_tpu.data.patches import gather_patches_normalized, pad_volumes
from nnal_tpu.ops.gather_pallas import gather_patches_pallas
from nnal_tpu.ops.similarity_pallas import max_similarity_pallas


def test_similarity_rowmax_matches_xla():
    rng = np.random.default_rng(0)
    pool = rng.normal(size=(700, 64)).astype(np.float32)
    ref = rng.normal(size=(300, 64)).astype(np.float32)
    pool_n = pool / np.linalg.norm(pool, axis=1, keepdims=True)
    ref_n = ref / np.linalg.norm(ref, axis=1, keepdims=True)

    ours = np.asarray(max_similarity_pallas(jnp.asarray(pool_n),
                                            jnp.asarray(ref_n),
                                            interpret=True))
    oracle = (pool_n @ ref_n.T).max(axis=1)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-6)


def test_similarity_padding_never_wins():
    # all true similarities are strongly negative; zero-padded reference
    # rows (dot=0) must not leak into the max
    pool_n = np.tile(np.array([[1.0, 0.0]], np.float32), (600, 1))
    ref_n = np.tile(np.array([[-1.0, 0.0]], np.float32), (5, 1))
    ours = np.asarray(max_similarity_pallas(jnp.asarray(pool_n),
                                            jnp.asarray(ref_n),
                                            interpret=True))
    np.testing.assert_allclose(ours, -1.0, atol=1e-6)


def test_gather_pallas_matches_xla():
    rng = np.random.default_rng(1)
    shape = (20, 22, 8)
    vols = [rng.normal(size=shape), rng.normal(size=shape) + 3]
    patch_shape = (5, 5, 1)
    padded = pad_volumes(vols, patch_shape)
    inds = jnp.asarray(rng.choice(np.prod(shape), size=200, replace=False))
    mu = np.array([0.0, 3.0])
    sd = np.array([1.0, 2.0])

    oracle = gather_patches_normalized(padded, inds, mu, sd, patch_shape,
                                       shape)
    ours = gather_patches_pallas(padded, inds, mu, sd, patch_shape, shape,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle),
                               rtol=1e-5, atol=1e-5)
