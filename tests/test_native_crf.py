"""Native permutohedral DenseCRF (runtime/dense_crf.cc) vs exact oracles.

The lattice filter is checked against a brute-force O(N^2) Gaussian kernel
(normalized comparison — the lattice's constant gain cancels), the mean
field against a NumPy implementation of the same symmetric-normalized
Potts update with the EXACT kernel, and the ``dcrf_postprocess_2d`` auto
path end-to-end.  Reference semantics: PW_analyze_results.py:539-592.
"""

import numpy as np
import pytest

from nnal_tpu.runtime.crf_native import (crf_native_available,
                                         dcrf2d_meanfield,
                                         permutohedral_filter)

pytestmark = pytest.mark.skipif(not crf_native_available(),
                                reason="g++ toolchain unavailable")


def _exact_normalized(feat, vals, sigma=1.0):
    d2 = ((feat[:, None, :] - feat[None, :, :]) ** 2).sum(-1)
    K = np.exp(-d2 / (2.0 * sigma * sigma))
    return (K @ vals) / (K @ np.ones((len(feat), 1)))


@pytest.mark.parametrize("d,tol_err,tol_corr", [(2, 0.2, 0.985),
                                                (3, 0.3, 0.97),
                                                (5, 0.5, 0.95)])
def test_filter_matches_exact_gaussian(d, tol_err, tol_corr):
    """Normalized lattice filtering approximates the exact Gaussian kernel
    (the approximation loosens with dimension, as in any permutohedral
    implementation — correlation stays high)."""
    rng = np.random.default_rng(0)
    N = 400
    feat = rng.normal(0, 2.0, (N, d)).astype(np.float32)
    vals = rng.normal(size=(N, 3)).astype(np.float32)
    out = permutohedral_filter(feat, vals)
    ones = permutohedral_filter(feat, np.ones((N, 1), np.float32))
    approx_n = out / ones
    exact_n = _exact_normalized(feat, vals)
    err = np.linalg.norm(approx_n - exact_n) / np.linalg.norm(exact_n)
    corr = np.corrcoef(approx_n.ravel(), exact_n.ravel())[0, 1]
    assert err < tol_err and corr > tol_corr


def test_filter_bandwidth_is_calibrated():
    """At d=2 the lattice's effective Gaussian bandwidth is sigma=1 in
    pre-scaled feature units (the best-fit sigma over a sweep) — i.e. the
    embedding scale factors are right."""
    rng = np.random.default_rng(1)
    N = 300
    feat = rng.normal(0, 2.0, (N, 2)).astype(np.float32)
    vals = rng.normal(size=(N, 2)).astype(np.float32)
    approx_n = (permutohedral_filter(feat, vals)
                / permutohedral_filter(feat, np.ones((N, 1), np.float32)))
    errs = {s: np.linalg.norm(approx_n - _exact_normalized(feat, vals, s))
            for s in (0.6, 0.8, 1.0, 1.25, 1.5)}
    assert min(errs, key=errs.get) == 1.0


def _numpy_meanfield(posts, img, iters, sxy_g=3.0, w_g=3.0, sxy_b=50.0,
                     srgb=4.0, w_b=10.0):
    """Exact-kernel oracle of the native solver's update: symmetric
    normalization, Potts compatibility, self-interaction included."""
    H, W, C = posts.shape
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    pos = np.stack([yy.ravel(), xx.ravel()], -1)
    g = img.reshape(H * W, -1).astype(np.float32)

    def kernel(feat):
        d2 = ((feat[:, None, :] - feat[None, :, :]) ** 2).sum(-1)
        K = np.exp(-d2 / 2.0)
        nrm = 1.0 / np.sqrt(K @ np.ones(len(feat)))
        return K, nrm

    Kg, ng = kernel(pos / sxy_g)
    Kb, nb = kernel(np.concatenate([pos / sxy_b, g / srgb], -1))
    unary = -np.log(np.clip(posts.reshape(H * W, C), 1e-8, None))
    q = np.exp(-unary)
    q /= q.sum(-1, keepdims=True)
    for _ in range(iters):
        E = unary.copy()
        for K, nrm, w in ((Kg, ng, w_g), (Kb, nb, w_b)):
            msg = nrm[:, None] * (K @ (nrm[:, None] * q))
            E += w * (msg.sum(-1, keepdims=True) - msg)
        q = np.exp(-(E - E.min(-1, keepdims=True)))
        q /= q.sum(-1, keepdims=True)
    return q.reshape(H, W, C)


def test_meanfield_matches_exact_kernel_oracle():
    rng = np.random.default_rng(2)
    H, W = 18, 14
    truth = np.zeros((H, W))
    truth[4:12, 3:10] = 1.0
    img = truth * 50 + rng.normal(0, 3, (H, W))
    p1 = np.clip(0.7 * truth + 0.15 + rng.normal(0, 0.2, (H, W)),
                 0.02, 0.98)
    posts = np.stack([1 - p1, p1], -1).astype(np.float32)
    q_nat = dcrf2d_meanfield(posts, img.astype(np.float32), iters=5)
    q_ora = _numpy_meanfield(posts, img, iters=5)
    agree = np.mean(q_nat.argmax(-1) == q_ora.argmax(-1))
    assert agree >= 0.95
    np.testing.assert_allclose(q_nat.sum(-1), 1.0, rtol=1e-4)


def test_meanfield_denoises_and_is_deterministic():
    rng = np.random.default_rng(3)
    H = W = 32
    truth = np.zeros((H, W))
    truth[8:24, 8:24] = 1.0
    img = truth * 60 + rng.normal(0, 3, (H, W))
    p1 = np.clip(0.8 * truth + 0.1 + rng.normal(0, 0.2, (H, W)),
                 0.01, 0.99)
    posts = np.stack([1 - p1, p1], -1).astype(np.float32)
    q1 = dcrf2d_meanfield(posts, img.astype(np.float32), iters=5)
    q2 = dcrf2d_meanfield(posts, img.astype(np.float32), iters=5)
    np.testing.assert_array_equal(q1, q2)
    err_before = np.mean((p1 > 0.5) != truth)
    err_after = np.mean(q1.argmax(-1) != truth)
    assert err_after < err_before


def test_meanfield_no_bilateral_term():
    """image=None drops the bilateral term (pure Gaussian smoothing)."""
    rng = np.random.default_rng(4)
    p1 = np.clip(rng.uniform(0.3, 0.7, (12, 12)), 0.01, 0.99)
    posts = np.stack([1 - p1, p1], -1).astype(np.float32)
    q = dcrf2d_meanfield(posts, None, iters=3)
    assert q.shape == (12, 12, 2)
    np.testing.assert_allclose(q.sum(-1), 1.0, rtol=1e-4)


def test_dcrf_postprocess_auto_prefers_native():
    """The evaluation wrapper routes through the native solver (full dense
    model) and still cleans noisy predictions."""
    from nnal_tpu.evaluation.crf import dcrf_postprocess_2d

    rng = np.random.default_rng(5)
    H = W = 24
    truth = np.zeros((H, W))
    truth[6:18, 6:18] = 1.0
    img = truth * 60 + rng.normal(0, 3, (H, W))
    p1 = np.clip(0.8 * truth + 0.1 + rng.normal(0, 0.15, (H, W)),
                 0.01, 0.99)
    ref_native = dcrf_postprocess_2d(p1, img, iters=3, backend="native")
    ref_auto = dcrf_postprocess_2d(p1, img, iters=3, backend="auto")
    np.testing.assert_array_equal(ref_native, ref_auto)
    assert ref_auto.dtype == np.uint8
    assert (np.mean(ref_auto != truth)
            <= np.mean((p1 > 0.5).astype(int) != truth))


def test_generic_feats_entry_matches_2d_entry():
    """dcrf_meanfield_feats with hand-built 2D grid features reproduces the
    dcrf2d_meanfield result bit-for-bit (the 2D entry delegates to it)."""
    rng = np.random.default_rng(6)
    H, W = 15, 13
    p1 = np.clip(rng.uniform(0, 1, (H, W)), 0.02, 0.98)
    img = rng.normal(0, 20, (H, W)).astype(np.float32)
    posts = np.stack([1 - p1, p1], -1).astype(np.float32)
    q2d = dcrf2d_meanfield(posts, img, iters=4)

    from nnal_tpu.runtime.crf_native import dcrf_meanfield_feats
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    pos = np.stack([yy.ravel(), xx.ravel()], -1)
    fg = pos / 3.0
    fb = np.concatenate([pos / 50.0, img.reshape(-1, 1) / 4.0], -1)
    qg = dcrf_meanfield_feats(posts.reshape(-1, 2), fg, 3.0, fb, 10.0,
                              iters=4)
    np.testing.assert_array_equal(q2d.reshape(-1, 2), qg)


def test_dcrf3d_volumetric_denoising():
    """3D CRF (beyond the reference's slice-by-slice refinement) uses
    cross-slice smoothness: a z-column of flipped labels inside an
    otherwise-consistent 3D blob gets repaired."""
    from nnal_tpu.runtime.crf_native import dcrf3d_meanfield

    rng = np.random.default_rng(7)
    H = W = 20
    D = 7
    truth = np.zeros((H, W, D))
    truth[5:15, 5:15, 1:6] = 1.0
    vol = truth * 60 + rng.normal(0, 3, (H, W, D))
    p1 = np.clip(0.8 * truth + 0.1 + rng.normal(0, 0.18, (H, W, D)),
                 0.01, 0.99)
    # corrupt ONE interior slice's posterior inside the blob
    p1[7:12, 7:12, 3] = 0.15
    posts = np.stack([1 - p1, p1], -1).astype(np.float32)
    q = dcrf3d_meanfield(posts, vol.astype(np.float32), iters=5)
    assert q.shape == (H, W, D, 2)
    np.testing.assert_allclose(q.sum(-1), 1.0, rtol=1e-4)
    err_before = np.mean((p1 > 0.5) != truth)
    err_after = np.mean(q.argmax(-1) != truth)
    assert err_after < err_before
    # the corrupted interior voxels are recovered from the z-neighbors
    assert q.argmax(-1)[8:11, 8:11, 3].mean() > 0.5


def test_dcrf_postprocess_3d_wrapper():
    from nnal_tpu.evaluation.crf import dcrf_postprocess_3d

    rng = np.random.default_rng(8)
    truth = np.zeros((16, 16, 5))
    truth[4:12, 4:12, 1:4] = 1.0
    vol = truth * 60 + rng.normal(0, 3, truth.shape)
    p1 = np.clip(0.8 * truth + 0.1 + rng.normal(0, 0.15, truth.shape),
                 0.01, 0.99)
    seg = dcrf_postprocess_3d(p1, vol, iters=3)
    assert seg.shape == truth.shape and seg.dtype == np.uint8
    assert np.mean(seg != truth) <= np.mean((p1 > 0.5) != truth)
