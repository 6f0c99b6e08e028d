"""Native C++ host gather vs the JAX oracle + the prefetch loader."""

import jax.numpy as jnp
import numpy as np

from nnal_tpu.data.loaders import PrefetchLoader, prefetched_patch_batches
from nnal_tpu.data.patches import gather_patches_normalized, pad_volumes
from nnal_tpu.runtime.native import (
    gather_labels_native,
    gather_patches_native,
    native_available,
)


def test_native_builds():
    assert native_available(), "g++ build of patch_gather.cc failed"


def test_native_gather_matches_jax():
    rng = np.random.default_rng(0)
    shape = (18, 20, 7)
    vols = [rng.normal(size=shape), rng.normal(size=shape) * 2 + 1]
    patch_shape = (5, 5, 3)
    mu = np.array([0.0, 1.0])
    sd = np.array([1.0, 2.0])
    inds = rng.choice(np.prod(shape), size=50, replace=False)

    padded = pad_volumes(vols, patch_shape)
    oracle = np.asarray(gather_patches_normalized(
        padded, jnp.asarray(inds), mu, sd, patch_shape, shape))

    padded_np = [np.asarray(padded[j]) for j in range(2)]
    ours = gather_patches_native(padded_np, inds, patch_shape, shape, mu, sd)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-5)


def test_native_labels():
    rng = np.random.default_rng(1)
    mask = (rng.random((6, 7, 4)) > 0.5).astype(np.float32)
    inds = np.array([0, 13, 100])
    out = gather_labels_native(mask, inds)
    np.testing.assert_array_equal(out, mask.reshape(-1)[inds])


def test_prefetch_loader_pipeline():
    rng = np.random.default_rng(2)
    shape = (16, 16, 6)
    vols = [rng.normal(size=shape).astype(np.float32)]
    mask = (rng.random(shape) > 0.7).astype(np.float32)
    patch_shape = (5, 5, 1)
    padded = [np.asarray(pad_volumes(vols, patch_shape))[0]]
    train_inds = rng.choice(np.prod(shape), size=40, replace=False)

    loader = prefetched_patch_batches(
        padded, mask, train_inds, patch_shape, shape,
        mu=np.zeros(1), sd=np.ones(1), batch_size=16, nclass=2,
        rng=np.random.default_rng(0), epochs=2)
    n = 0
    for x, y in loader:
        assert x.shape[1:] == (5, 5, 1)
        assert y.shape[1] == 2
        n += x.shape[0]
    assert n == 2 * (16 * 2 + 8)  # 40 per epoch incl. overlap batch


def test_prefetch_loader_propagates_errors():
    def bad_gen():
        yield np.zeros((2, 2)), np.zeros((2, 2))
        raise RuntimeError("boom")

    loader = PrefetchLoader(bad_gen(), depth=1)
    next(loader)
    import pytest

    with pytest.raises(RuntimeError, match="boom"):
        while True:
            next(loader)
