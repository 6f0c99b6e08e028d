import jax.numpy as jnp
import numpy as np
from scipy.signal import convolve2d

from nnal_tpu.data.samplers import (
    even_odd_slice_split,
    generate_grid_samples,
    high_variance_filter,
    local_variance_map,
    sample_masked_volume,
)


def _oracle_vars_2d(img, d):
    """Reference get_vars_2d (patch_utils.py:794) via scipy."""
    img = np.uint64(img)
    kernel = np.ones((d, d))
    ex = convolve2d(img, kernel, "same") / float(d ** 2)
    ex2 = convolve2d(img ** 2, kernel, "same") / float(d ** 2)
    return ex2 - ex ** 2


def test_variance_map_matches_scipy_oracle():
    # interior comparison only: we mean-center before the box filter for f32
    # stability, which changes values in the zero-padded border region (a
    # reference artifact we do not preserve; see local_variance_map docstring)
    rng = np.random.default_rng(0)
    vol = rng.uniform(0, 100, size=(16, 18, 4))
    d = 5
    r = d // 2
    ours = np.asarray(local_variance_map(jnp.asarray(vol), d))
    for z in range(vol.shape[2]):
        oracle = _oracle_vars_2d(vol[:, :, z], d)
        # f32 box-filter accumulation vs the float64 oracle: ~0.3% relative
        # error is expected and harmless for the downstream log-threshold use
        np.testing.assert_allclose(ours[r:-r, r:-r, z], oracle[r:-r, r:-r],
                                   rtol=1e-2, atol=0.5)


def test_grid_samples_spacing_and_mask():
    shape = (12, 16, 5)
    mask = np.zeros(shape)
    mask[:2] = np.nan
    inds, labels = generate_grid_samples(shape, 4, mask)
    x, y, _ = np.unravel_index(inds, shape)
    assert (x % 4 == 0).all() and (y % 4 == 0).all()
    assert (x >= 2).all()  # NaN voxels discarded
    assert len(labels) == len(inds)
    # without mask: full grid over all slices
    inds2 = generate_grid_samples(shape, 4)
    assert len(inds2) == 3 * 4 * 5


def test_high_variance_filter():
    rng = np.random.default_rng(1)
    vol = np.zeros((20, 20, 3))
    vol[8:, 8:, :] = rng.uniform(0, 60, size=(12, 12, 3))  # textured region
    pool = np.arange(np.prod(vol.shape))
    keep = high_variance_filter(vol, (5, 5, 1), 2.0, pool)
    x, y, _ = np.unravel_index(pool[keep], vol.shape)
    # flat region interiors must be filtered out
    assert not np.any((x < 4) & (y < 4))
    assert len(keep) > 0


def test_sample_masked_volume_balance(rng):
    from nnal_tpu.data.io import synthetic_subject

    vols, mask = synthetic_subject(shape=(24, 24, 8), n_modalities=1, seed=0)
    inds, labels, types = sample_masked_volume(
        vols[0], mask, slices=[2, 4], N=(5, 5, 5), rng=rng)
    assert len(inds) == len(labels) == len(types)
    assert set(np.unique(types)).issubset({0, 1, 2})
    # masked samples carry label 1
    assert (labels[types == 0] == 1).all()
    assert (labels[types > 0] == 0).all()
    # per-slice caps respected
    assert (types == 0).sum() <= 2 * 5


def test_even_odd_split():
    shape = (4, 4, 6)
    inds = np.arange(np.prod(shape))
    pool, test = even_odd_slice_split(inds, shape)
    z = np.unravel_index(pool, shape)[2]
    assert (z % 2 == 0).all()
    assert len(test) == len(inds)


def test_filter_by_parcellation(tmp_path):
    """preprop_NVM_data parity (patch_utils.py:600-616): samples on
    zero-parcellation voxels are dropped; path input round-trips."""
    import numpy as np
    from nnal_tpu.data.formats import write_nrrd
    from nnal_tpu.data.samplers import filter_by_parcellation

    parc = np.zeros((4, 4, 3), np.int16)
    parc[0, 0, 0] = 2
    parc[1, 2, 1] = 7
    inds = np.ravel_multi_index(([0, 1, 3], [0, 2, 3], [0, 1, 2]),
                                parc.shape)
    labels = np.array([1, 0, 1])
    fi, fl = filter_by_parcellation(inds, labels, parc)
    np.testing.assert_array_equal(fi, inds[:2])
    np.testing.assert_array_equal(fl, [1, 0])
    p = str(tmp_path / "parc.nrrd")
    write_nrrd(p, parc)
    fi2, fl2 = filter_by_parcellation(inds, labels, p)
    np.testing.assert_array_equal(fi2, fi)
    np.testing.assert_array_equal(fl2, fl)


def test_sample_types_of_matches_sampler_partition():
    """sample_types_of must reproduce the exact types sample_masked_volume
    journals for its own picks (same partition rule, any voxel)."""
    from nnal_tpu.data.samplers import sample_types_of

    rng = np.random.default_rng(7)
    img = rng.uniform(0, 100, size=(14, 16, 6))
    mask = np.zeros_like(img)
    mask[4:8, 5:9, :] = 1
    inds, labels, types = sample_masked_volume(img, mask, range(6),
                                               (5, 5, 5), rng)
    np.testing.assert_array_equal(sample_types_of(img, mask, inds), types)
    # labels consistent with type 0 = masked
    np.testing.assert_array_equal(labels == 1, types == 0)


def test_query_type_analysis_uses_sampler_rule(tmp_path):
    """engine.analysis.query_type_analysis (covered e2e in
    test_analysis.py) must classify journaled queries with the exact
    sampler partition rule — stub-expr composition check."""
    from nnal_tpu.core.journal import MethodJournal
    from nnal_tpu.data.samplers import sample_types_of
    from nnal_tpu.engine.analysis import query_type_analysis

    rng = np.random.default_rng(8)
    img = rng.uniform(0, 100, size=(12, 12, 4))
    mask = np.zeros_like(img)
    mask[3:6, 3:6, :] = 1

    class _Stub:
        root_dir = str(tmp_path)

        def _load_subject(self):
            return [img], mask

    j = MethodJournal(str(tmp_path), "entropy")
    q0 = np.array([3 * 12 * 4 + 3 * 4 + 1, 0])       # one masked, one bg
    q1 = np.array([5, 7, 11])
    j.record_queries(0, q0)
    j.record_queries(1, q1)
    rounds = query_type_analysis(_Stub(), "entropy")
    assert len(rounds) == 2
    np.testing.assert_array_equal(rounds[0], sample_types_of(img, mask, q0))
    np.testing.assert_array_equal(rounds[1], sample_types_of(img, mask, q1))
    assert rounds[0][0] == 0                          # inside the mask
