import numpy as np

from nnal_tpu.evaluation.postproc import (
    fill_holes,
    largest_connected_component,
    lesion_components,
    postprocess_segmentation,
)
from nnal_tpu.scoring.superpixel import (
    oversegment_volume,
    slic_2d,
    superpix_scores,
    supix_query,
)


def test_largest_cc():
    seg = np.zeros((10, 10, 4))
    seg[1:4, 1:4, 1:3] = 1          # big blob (18 voxels)
    seg[7:9, 7:9, 0] = 1            # small blob (4 voxels)
    out = largest_connected_component(seg)
    assert out[2, 2, 1] == 1
    assert out[7, 7, 0] == 0
    assert out.sum() == 18


def test_fill_holes():
    # the cavity must be enclosed in 3D for binary_fill_holes to close it
    seg = np.zeros((8, 8, 3))
    seg[1:7, 1:7, :] = 1
    seg[3, 3, 1] = 0
    out = fill_holes(seg)
    assert out[3, 3, 1] == 1


def test_lesion_components():
    mask = np.zeros((12, 12, 2))
    mask[0:2, 0:2, :] = 1   # 8 voxels
    mask[6, 6, 0] = 1       # 1 voxel
    labels, sizes = lesion_components(mask, min_size=4)
    assert len(sizes) == 1 and sizes[0] == 8
    assert labels[6, 6, 0] == 0


def test_postprocess_pipeline():
    seg = np.zeros((8, 8, 3))
    seg[1:6, 1:6, :] = 1
    seg[3, 3, 1] = 0   # enclosed cavity
    seg[7, 7, 2] = 1   # spurious small component
    out = postprocess_segmentation(seg)
    assert out[3, 3, 1] == 1 and out[7, 7, 2] == 0


def test_slic_covers_and_is_local():
    rng = np.random.default_rng(0)
    img = np.zeros((24, 24))
    img[:, 12:] = 10.0
    img += rng.normal(0, 0.1, img.shape)
    labels = slic_2d(img, n_segments=16, n_iter=5)
    assert labels.shape == img.shape
    n = labels.max() + 1
    assert 4 <= n <= 36
    # superpixels should not straddle the sharp boundary much
    left_labels = set(np.unique(labels[:, :10]))
    right_labels = set(np.unique(labels[:, 14:]))
    assert len(left_labels & right_labels) == 0


def test_superpix_scores_min_reduction():
    overseg = np.zeros((4, 4, 1), dtype=np.int64)
    overseg[2:, :, 0] = 1
    inds = np.array([0, 1, 2 * 4 + 0])  # two pixels in sp0, one in sp1
    scores = np.array([0.5, 0.2, 0.9])
    sp = superpix_scores(overseg, inds, scores)
    assert sp.shape == (1, 2)
    assert sp[0, 0] == 0.2 and sp[0, 1] == 0.9


def test_supix_query_selects_most_uncertain():
    overseg = np.zeros((4, 4, 2), dtype=np.int64)
    overseg[:, 2:, :] = 1
    pool = np.arange(4 * 4 * 2)
    unc = np.ones(len(pool))
    # make superpixel (slice 1, label 0) most uncertain
    x, y, z = np.unravel_index(pool, overseg.shape)
    unc[(z == 1) & (y < 2)] = 0.01
    q, members = supix_query(overseg, pool, unc, k=1)
    assert q.shape == (2, 1)
    assert q[0, 0] == 1 and q[1, 0] == 0
    mx, my, mz = np.unravel_index(members[0], overseg.shape)
    assert (mz == 1).all() and (my < 2).all()


def test_oversegment_volume_shape():
    vol = np.random.default_rng(1).random((16, 16, 3))
    out = oversegment_volume(vol, n_segments=9)
    assert out.shape == vol.shape


def test_visualize_functions(tmp_path):
    from nnal_tpu.evaluation.visualize import (
        interpolate_curves,
        mean_std_over_runs,
        plot_learning_curves,
    )

    mu, sd = mean_std_over_runs([np.array([1, 2, 3]),
                                 np.array([2, 3, 4, 5])])
    np.testing.assert_allclose(mu, [1.5, 2.5, 3.5])
    grid, arr = interpolate_curves(
        [np.array([0.0, 1.0]), np.array([0.5, 1.5])],
        [np.array([0, 10]), np.array([0, 10])], n_points=5)
    assert arr.shape == (2, 5)
    p = str(tmp_path / "curve.png")
    plot_learning_curves({"entropy": np.array([0.1, 0.2])}, 5, p)
    import os

    assert os.path.getsize(p) > 0


def test_native_slic_matches_numpy_oracle():
    """The C++ SLIC (runtime/slic.cc) mirrors the NumPy implementation —
    same seeds, same strict-< windowed assignment order, same centroid
    update — so on a non-degenerate (noisy) image the label maps are
    identical."""
    import pytest

    from nnal_tpu.runtime.slic_native import (slic_2d_native,
                                              slic_native_available)

    if not slic_native_available():
        pytest.skip("g++ toolchain unavailable")
    rng = np.random.default_rng(3)
    img = rng.normal(0, 1, (96, 80)) + 3.0 * (rng.uniform(size=(96, 80))
                                              > 0.6)
    ln = slic_2d_native(img, n_segments=25, n_iter=8)
    lp = slic_2d(img, n_segments=25, n_iter=8, backend="numpy")
    np.testing.assert_array_equal(ln, lp)
    la = slic_2d(img, n_segments=25, n_iter=8)  # auto -> native
    np.testing.assert_array_equal(la, ln)
