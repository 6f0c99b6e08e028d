"""Pool-based classification active learning, end to end.

The reference workflow this mirrors: ``AL.Experiment`` (AL.py:16-753) —
a root directory holding *runs* (random data partitions + a fresh model
init) and *methods* within runs (independent AL trajectories from the
same start), with per-round test predictions journaled to
``predicts.txt`` and accuracies to ``accs.txt``.

The data here is a synthetic two-Gaussian image problem; with real data,
``attach_data(X, labels)`` takes any ``(n, h, w, c)`` array, or use the
disk-backed path (``engine.experiment.attach_pool`` +
``data/image_pool.ImagePathPool``) for pools too big for memory —
that's the reference's AlexNet/Caltech-101 flow (``cli/run_querying.py``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_data(n: int = 240, seed: int = 0):
    import numpy as np

    rng = np.random.default_rng(seed)
    X0 = rng.normal(size=(n // 2, 8, 8, 1))
    X1 = rng.normal(size=(n // 2, 8, 8, 1)) + 1.5
    X = np.concatenate([X0, X1]).astype(np.float32)
    y = np.repeat([0, 1], n // 2)
    perm = rng.permutation(n)
    return X[perm], y[perm]


def main(root_dir: str, methods=("entropy", "random"), nqueries: int = 30,
         tiny: bool = False) -> dict:
    import numpy as np

    from nnal_tpu.core.config import ExperimentConfig
    from nnal_tpu.engine.experiment import Experiment

    if tiny:
        nqueries = min(nqueries, 10)
    cfg = ExperimentConfig.from_pars({
        "model_name": "PW", "nclass": 2, "patch_shape": (8, 8, 1),
        "k": 5, "B": 40, "ntb": 128, "b": 16, "epochs": 3,
        "learning_rate": 3e-4, "optimizer_name": "Adam",
        "dropout_rate": 0.2, "init_size": 10, "test_ratio": 0.25,
    })
    X, y = make_data(120 if tiny else 240)
    expr = Experiment(root_dir, cfg)
    expr.attach_data(X, y)
    run = expr.add_run()
    for m in methods:
        expr.add_method(m, run)
        res = expr.run_method(m, run, nqueries)
        print(f"{m:12s} accuracy per round:",
              [round(float(v), 3) for v in res["accs"]])
    # per-run aggregation (reference eval_run/summarize_all, AL.py:535,679)
    summary = expr.summarize_all(list(methods))
    for m, curve in summary.items():
        print(f"{m:12s} mean curve:", np.round(np.atleast_1d(curve), 3))
    return summary


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("root_dir", nargs="?",
                    default="/tmp/nnal_classification_al")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--methods", default="entropy,random")
    ap.add_argument("--nqueries", type=int, default=30)
    a = ap.parse_args()
    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    main(a.root_dir, tuple(a.methods.split(",")), a.nqueries, a.tiny)
