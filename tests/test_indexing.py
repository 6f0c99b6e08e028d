import numpy as np
import pytest

from nnal_tpu.data.indexing import (
    expand_raveled_inds,
    global2local_inds,
    local2global_inds,
    ravel_binary_mask,
)


def _oracle_global2local(batch_inds, set_sizes):
    """Literal transcription of the reference algorithm
    (datasets/utils.py:224-250) as a NumPy oracle."""
    cumvols = np.append(-1, np.cumsum(set_sizes) - 1)
    set_inds = cumvols.searchsorted(batch_inds) - 1
    return [np.array(batch_inds)[set_inds == i] - cumvols[i] - 1
            for i in range(len(set_sizes))]


@pytest.mark.parametrize("seed", range(5))
def test_global2local_matches_reference_oracle(seed):
    rng = np.random.default_rng(seed)
    sizes = rng.integers(0, 50, size=6)
    n = int(sizes.sum())
    if n == 0:
        return
    batch = rng.choice(n, size=min(n, 37), replace=False)
    ours = global2local_inds(batch, sizes)
    oracle = _oracle_global2local(batch, sizes)
    assert len(ours) == len(oracle)
    for a, b in zip(ours, oracle):
        np.testing.assert_array_equal(np.sort(a), np.sort(b))


def test_global_local_roundtrip():
    rng = np.random.default_rng(1)
    sizes = [10, 0, 25, 7]
    n = sum(sizes)
    batch = np.sort(rng.choice(n, size=20, replace=False))
    locals_ = global2local_inds(batch, sizes)
    back = local2global_inds(locals_, sizes)
    np.testing.assert_array_equal(np.sort(back), batch)


def test_local_inds_in_range():
    sizes = [5, 3, 8]
    locals_ = global2local_inds(np.arange(sum(sizes)), sizes)
    for li, s in zip(locals_, sizes):
        assert len(li) == s
        assert li.min() == 0 and li.max() == s - 1


def test_expand_raveled_inds_axis2():
    shape = (6, 7, 5)
    rng = np.random.default_rng(2)
    vol = rng.normal(size=shape)
    z = 3
    sl = vol[:, :, z]
    inds2d = np.array([0, 5, 13, 41])
    inds3d = expand_raveled_inds(inds2d, z, 2, shape)
    np.testing.assert_allclose(vol.reshape(-1)[inds3d], sl.reshape(-1)[inds2d])


def test_expand_raveled_inds_axis0():
    shape = (4, 6, 5)
    vol = np.arange(np.prod(shape)).reshape(shape)
    x = 2
    sl = vol[x]
    inds2d = np.array([1, 7, 29])
    inds3d = expand_raveled_inds(inds2d, x, 0, shape)
    np.testing.assert_array_equal(vol.reshape(-1)[inds3d], sl.reshape(-1)[inds2d])


def test_ravel_binary_mask():
    mask = np.zeros((3, 3, 2))
    mask[1, 2, 0] = 1
    mask[0, 0, 1] = 1
    inds = ravel_binary_mask(mask)
    got = np.zeros_like(mask)
    got.reshape(-1)[inds] = 1
    np.testing.assert_array_equal(got, mask)
