"""Classification AL driver (AlexNet/Caltech style).

Rebuild of ``run_querying_scr.py`` + ``run_AlexNet_AL`` (reference
NNAL.py:587-762): filter the dataset to target classes, split test/pool,
then loop querying methods over a shared initial model with **per-method
resume** — a method whose accuracy curve is already complete is skipped,
an interrupted one resumes from its queries journal (the reference skips
methods whose index dirs exist and restores the saved initial graph,
NNAL.py:626-632,660-687).
"""

from __future__ import annotations

import os
import sys
from typing import Optional, Sequence

import numpy as np

from nnal_tpu.core.config import ExperimentConfig, set_parameters
from nnal_tpu.engine.experiment import Experiment

DEFAULT_CLS_PARS = {
    "model_name": "Alex",
    "k": 10,
    "B": 100,
    "ntb": 256,
    "b": 32,
    "epochs": 2,
    "learning_rate": 1e-3,
    "dropout_rate": 0.5,
    "optimizer_name": "Adam",
    "lambda_": 0.0,
    "init_size": 20,
    "test_ratio": 0.2,
    "seed": 0,
}


def filter_classes(labels, target_classes: Sequence[int]):
    """Restrict a dataset to ``target_classes`` and remap labels to
    0..c-1 (reference run_querying_scr.py's class filtering)."""
    labels = np.asarray(labels)
    keep = np.flatnonzero(np.isin(labels, target_classes))
    remap = {int(c): i for i, c in enumerate(target_classes)}
    new_labels = np.asarray([remap[int(v)] for v in labels[keep]],
                            np.int64)
    return keep, new_labels


def run_classification_al(root_dir: str, pool, methods: Sequence[str],
                          max_queries: int, overrides: str = "",
                          run: Optional[int] = None) -> dict:
    """Multi-method AL campaign with per-method resume.  ``pool`` is any
    engine pool (``InMemoryPool`` / disk-backed ``ImagePathPool``)."""
    par_path = os.path.join(root_dir, "parameters.txt")
    if os.path.exists(par_path):
        expr = Experiment(root_dir)
    else:
        pars = set_parameters(DEFAULT_CLS_PARS, overrides)
        pars["nclass"] = int(np.max(pool.labels)) + 1
        expr = Experiment(root_dir, ExperimentConfig.from_pars(pars))
    expr.attach_pool(pool)

    if run is None:
        runs = [int(d) for d in os.listdir(root_dir) if d.isdigit()]
        run = min(runs) if runs else expr.add_run()

    expected_rounds = -(-max_queries // expr.config.query.k)
    results = {}
    for method in methods:
        mdir = os.path.join(root_dir, str(run), method)
        accs_path = os.path.join(mdir, "accs.txt")
        if os.path.exists(accs_path):
            done = len(np.atleast_1d(np.loadtxt(accs_path)))
            if done >= expected_rounds:
                # complete — skip (reference NNAL.py:626-632)
                results[method] = np.atleast_1d(np.loadtxt(accs_path))
                continue
        if not os.path.exists(os.path.join(mdir, "curr_weights.npz")):
            expr.add_method(method, run)
        out = expr.run_method(method, run, max_queries)
        results[method] = out["accs"]
    return results


def main(argv=None):
    """argv: root_dir imgs_path_file labels_file max_queries
    [method,method,...] [key=val,...]"""
    from nnal_tpu.core.platform import honor_env_platforms

    honor_env_platforms()
    from nnal_tpu.data.image_pool import ImagePathPool

    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 4:
        print(__doc__)
        return 1
    root_dir, paths_file, labels_file = argv[0], argv[1], argv[2]
    max_queries = int(argv[3])
    methods = argv[4].split(",") if len(argv) > 4 else ["random", "entropy"]
    overrides = argv[5] if len(argv) > 5 else ""
    pool = ImagePathPool(paths_file, labels_file, target_shape=(227, 227))
    res = run_classification_al(root_dir, pool, methods, max_queries,
                                overrides)
    for m, accs in res.items():
        print(f"{m}: {np.asarray(accs).tolist()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
