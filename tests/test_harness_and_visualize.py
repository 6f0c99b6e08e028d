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
