import jax.numpy as jnp
import numpy as np

from nnal_tpu.data.patches import (
    gather_labels,
    gather_patches,
    gather_patches_multimg,
    gather_patches_normalized,
    gather_patches_rowtake,
    pad_volumes,
    patch_radii,
)


def _oracle_get_patches(imgs, inds, patch_shape, mask=None):
    """NumPy oracle transcribing the reference loop semantics
    (patch_utils.py:1087-1172): per-index (d1,d2,d3) windows per modality,
    concatenated along depth."""
    d1, d2, d3 = patch_shape
    m = len(imgs)
    rads = [(s - 1) // 2 for s in patch_shape]
    padded = [np.pad(img, [(r, r) for r in rads]) for img in imgs]
    orig_shape = imgs[0].shape
    multinds = np.unravel_index(inds, orig_shape)
    b = len(inds)
    patches = np.zeros((b, d1, d2, m * d3))
    for i in range(b):
        c = [multinds[k][i] + rads[k] for k in range(3)]
        for j in range(m):
            patch = padded[j][c[0] - rads[0]:c[0] + rads[0] + 1,
                              c[1] - rads[1]:c[1] + rads[1] + 1,
                              c[2] - rads[2]:c[2] + rads[2] + 1]
            patches[i, :, :, j * d3:(j + 1) * d3] = patch
    if mask is not None:
        return patches, mask[multinds]
    return patches


def test_gather_matches_reference_oracle():
    rng = np.random.default_rng(0)
    shape = (12, 14, 9)
    imgs = [rng.normal(size=shape), rng.normal(size=shape)]
    mask = (rng.random(shape) > 0.5).astype(np.float64)
    patch_shape = (5, 5, 3)
    inds = rng.choice(np.prod(shape), size=17, replace=False)

    oracle_p, oracle_l = _oracle_get_patches(imgs, inds, patch_shape, mask)

    padded = pad_volumes(imgs, patch_shape)
    ours = gather_patches(padded, jnp.asarray(inds), patch_shape, shape)
    labels = gather_labels(mask, inds, shape)

    np.testing.assert_allclose(np.asarray(ours), oracle_p, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(labels), oracle_l)


def test_gather_normalized():
    rng = np.random.default_rng(1)
    shape = (10, 10, 6)
    imgs = [rng.normal(size=shape) * 3 + 5, rng.normal(size=shape)]
    patch_shape = (3, 3, 1)
    inds = np.array([0, 37, 100, np.prod(shape) - 1])
    mu = np.array([5.0, 0.0])
    sd = np.array([3.0, 1.0])

    oracle = _oracle_get_patches(imgs, inds, patch_shape)
    d3 = patch_shape[2]
    for j in range(2):
        oracle[:, :, :, j * d3:(j + 1) * d3] = (
            oracle[:, :, :, j * d3:(j + 1) * d3] - mu[j]) / sd[j]

    padded = pad_volumes(imgs, patch_shape)
    ours = gather_patches_normalized(
        padded, jnp.asarray(inds), mu, sd, patch_shape, shape)
    np.testing.assert_allclose(np.asarray(ours), oracle, rtol=1e-5, atol=1e-5)


def test_edge_patches_zero_padded():
    shape = (6, 6, 4)
    img = np.ones(shape)
    patch_shape = (5, 5, 3)
    padded = pad_volumes([img], patch_shape)
    # corner voxel: most of the window falls in the zero pad
    ours = np.asarray(gather_patches(
        padded, jnp.asarray([0]), patch_shape, shape))
    oracle = _oracle_get_patches([img], [0], patch_shape)
    np.testing.assert_allclose(ours, oracle)
    assert ours[0, 0, 0, 0] == 0.0  # padded corner
    assert ours[0, 2, 2, 1] == 1.0  # center voxel


def test_multimg_gather():
    rng = np.random.default_rng(3)
    shape = (8, 8, 6)
    patch_shape = (3, 3, 1)
    subs, masks, stats = [], [], []
    for s in range(3):
        vols = [rng.normal(size=shape) + s, rng.normal(size=shape)]
        subs.append(pad_volumes(vols, patch_shape))
        masks.append((rng.random(shape) > 0.5).astype(np.float64))
        stats.append([s, 1.0, 0.0, 1.0])
    img_inds = [np.array([1, 5]), np.array([], dtype=np.int64), np.array([10])]
    patches, labels = gather_patches_multimg(
        subs, img_inds, patch_shape, np.asarray(stats), masks=masks)
    assert len(patches) == 3
    assert patches[1] == [] and labels[1] == []
    assert np.asarray(patches[0]).shape == (2, 3, 3, 2)
    assert np.asarray(patches[2]).shape == (1, 3, 3, 2)
    assert len(np.asarray(labels[0])) == 2


def test_rowtake_gather_bit_identical():
    """The row-take + one-hot-matmul gather must be BIT-identical to the
    dynamic-slice gather (it feeds the same rank-parity-critical paths),
    including even patch dims (dynamic_slice start clamping) and a batch
    that is not a multiple of the inner chunk."""
    rng = np.random.default_rng(7)
    shape = (12, 14, 9)
    vols = [rng.normal(size=shape).astype(np.float32),
            rng.normal(size=shape).astype(np.float32)]
    for patch_shape in [(5, 5, 3), (5, 5, 1), (4, 6, 2), (3, 3, 2)]:
        padded = pad_volumes(vols, patch_shape)
        n = int(np.prod(shape))
        inds = np.concatenate([[0, n - 1],
                               rng.choice(n, size=37, replace=False)])
        ref = np.asarray(gather_patches(padded, jnp.asarray(inds),
                                        patch_shape, shape))
        fast = np.asarray(gather_patches_rowtake(
            padded, jnp.asarray(inds), patch_shape, shape, b_inner=16))
        np.testing.assert_array_equal(fast, ref, err_msg=str(patch_shape))


def test_patch_radii():
    assert patch_radii((25, 25, 1)) == (12, 12, 0)
    assert patch_radii((5, 3, 7)) == (2, 1, 3)
