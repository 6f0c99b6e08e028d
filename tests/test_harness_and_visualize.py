import numpy as np

from nnal_tpu.cli.softmax_harness import run_comparison, synthetic_mnist


def test_softmax_harness_comparison():
    X, y = synthetic_mnist(n_per_class=40, nclass=4, d=16, seed=0)
    curves = run_comparison(X, y, 4, k=8, rounds=3, init_size=12,
                            seed=0, steps=100)
    assert set(curves) == {"random", "entropy", "fi"}
    for c in curves.values():
        assert len(c) == 3
        assert np.isfinite(c).all()
    # informed strategies should at least end on par with start
    assert curves["entropy"][-1] >= curves["entropy"][0] - 0.1


def test_visualize_run(tmp_path):
    import jax

    from nnal_tpu.core.config import ExperimentConfig
    from nnal_tpu.engine.experiment import Experiment

    rng = np.random.default_rng(0)
    X = np.concatenate([rng.normal(size=(30, 8, 8, 1)) - 2,
                        rng.normal(size=(30, 8, 8, 1)) + 2]).astype(
                            np.float32)
    y = np.repeat([0, 1], 30)
    cfg = ExperimentConfig.from_pars({
        "model_name": "PW", "patch_shape": (8, 8, 1), "k": 5, "B": 20,
        "ntb": 64, "b": 16, "epochs": 1, "learning_rate": 3e-4,
        "optimizer_name": "Adam", "init_size": 8, "test_ratio": 0.3})
    expr = Experiment(str(tmp_path / "v"), cfg)
    expr.attach_data(X, y)
    run = expr.add_run()
    expr.add_method("random", run)
    expr.run_method("random", run, 5)
    p = str(tmp_path / "curves.png")
    expr.visualize_run(run, ["random"], p)
    import os

    assert os.path.getsize(p) > 0


def test_interp_slice_posteriors_grid_exact():
    """Bilinear on a complete sample grid: exact at the samples and exact
    for a linear field everywhere inside the hull (reference
    get_interp_slice_posts, PW_analyze_results.py:866)."""
    from nnal_tpu.evaluation.visualize import interp_slice_posteriors

    gx = np.arange(0, 12, 3)
    gy = np.arange(0, 16, 4)
    xx, yy = np.meshgrid(gx, gy, indexing="ij")
    x, y = xx.ravel(), yy.ravel()
    vals = 0.5 * x + 0.25 * y + 1.0          # linear field
    out = interp_slice_posteriors(x, y, vals, (12, 16))
    assert out.shape == (12, 16)
    # exact at the samples
    np.testing.assert_allclose(out[x, y], vals, atol=1e-12)
    # exact linear reconstruction inside the hull
    ix, iy = np.meshgrid(np.arange(gx.max() + 1), np.arange(gy.max() + 1),
                         indexing="ij")
    np.testing.assert_allclose(out[:gx.max() + 1, :gy.max() + 1],
                               0.5 * ix + 0.25 * iy + 1.0, atol=1e-9)
    # clamped (not extrapolated) outside the hull
    np.testing.assert_allclose(out[11, :gy.max() + 1],
                               out[gx.max(), :gy.max() + 1], atol=1e-12)


def test_interp_slice_posteriors_scattered():
    from nnal_tpu.evaluation.visualize import interp_slice_posteriors

    x = np.array([0, 5, 2])
    y = np.array([0, 5, 7])
    vals = np.array([1.0, 2.0, 3.0])
    out = interp_slice_posteriors(x, y, vals, (8, 8))
    np.testing.assert_allclose(out[x, y], vals, atol=1e-12)
    assert np.isfinite(out).all()
    assert out.min() >= vals.min() - 1e-9 and out.max() <= vals.max() + 1e-9


def test_overlay_superpixels():
    """mask_SuPix parity (PW_analyze_results.py:339-388): selected
    superpixels filled, all superpixel boundaries marked."""
    from nnal_tpu.evaluation.visualize import overlay_superpixels

    overseg = np.zeros((6, 6, 2), np.int64)
    overseg[:, 3:, :] = 1      # two vertical superpixels per slice
    codes = np.array([[1], [1]])    # slice 1, label 1
    out = overlay_superpixels(overseg, codes, show_bound=True)
    assert out.shape == overseg.shape
    # selected superpixel's members are all set on slice 1
    assert out[:, 3:, 1].all()
    # boundary columns are set on both slices
    assert out[:, 2, 0].all() and out[:, 3, 0].all()
    # interior of unselected superpixel on slice 0 stays clear
    assert not out[:, 0, 0].any() and not out[:, 5, 0].any()
    # without boundaries only the selection is marked
    out2 = overlay_superpixels(overseg, codes, show_bound=False)
    assert out2[:, 3:, 1].all() and not out2[:, :, 0].any()


def test_generate_rgb_mask():
    """patch_utils.py:1060-1086 parity: scaled grayscale base, mask ->
    red 230, mask2 -> green 200, empty masks skip channels."""
    import numpy as np

    from nnal_tpu.evaluation.visualize import generate_rgb_mask

    img = np.arange(16, dtype=np.float64).reshape(4, 4)
    m1 = np.zeros((4, 4)); m1[0, 0] = 1
    m2 = np.zeros((4, 4)); m2[1, 1] = 1
    rgb = generate_rgb_mask(img, m1, m2)
    assert rgb.dtype == np.uint8 and rgb.shape == (4, 4, 3)
    assert rgb[0, 0, 0] == 230 and rgb[1, 1, 1] == 200
    assert rgb[3, 3, 2] == 200          # max pixel scales to 200
    base = generate_rgb_mask(img)       # no masks: pure grayscale
    assert np.all(base[:, :, 0] == base[:, :, 1])
