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


def test_fuzz_global_local_roundtrip():
    """Randomized round-trip property over many set-size partitions:
    local2global(global2local(x)) is a permutation-free identity on the
    selected positions, per-subject locals stay in range, and every
    global index lands in exactly one subject."""
    from nnal_tpu.data.indexing import global2local_inds, local2global_inds

    rng = np.random.default_rng(123)
    for _ in range(50):
        n_sets = int(rng.integers(1, 6))
        sizes = [int(rng.integers(1, 40)) for _ in range(n_sets)]
        total = sum(sizes)
        k = int(rng.integers(1, total + 1))
        picks = rng.choice(total, size=k, replace=False)
        local = global2local_inds(picks, sizes)
        assert len(local) == n_sets
        for si, li in enumerate(local):
            assert ((0 <= li) & (li < sizes[si])).all()
        back = local2global_inds(local, sizes)
        assert sorted(back.tolist()) == sorted(picks.tolist())
        assert sum(len(li) for li in local) == k


def test_fuzz_expand_raveled_roundtrip():
    """expand_raveled_inds must place 2D slice indices at the right 3D
    voxels for random shapes, axes, and slices (vs a numpy oracle)."""
    from nnal_tpu.data.indexing import expand_raveled_inds

    rng = np.random.default_rng(7)
    for _ in range(30):
        shape = tuple(int(rng.integers(2, 9)) for _ in range(3))
        axis = int(rng.integers(0, 3))
        z = int(rng.integers(0, shape[axis]))
        plane = [s for i, s in enumerate(shape) if i != axis]
        n2d = plane[0] * plane[1]
        m = int(rng.integers(1, n2d + 1))
        inds2d = rng.choice(n2d, size=m, replace=False)
        out = expand_raveled_inds(inds2d, z, axis, shape)
        # oracle: scatter into a volume and compare coordinates
        vol = np.zeros(shape, bool)
        sl = np.zeros(plane, bool)
        sl.ravel()[inds2d] = True
        key = [slice(None)] * 3
        key[axis] = z
        vol[tuple(key)] = sl
        want = np.flatnonzero(vol.ravel())
        assert sorted(out.tolist()) == sorted(want.tolist())
