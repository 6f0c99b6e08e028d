"""Multi-subject ("universal") active learning across training subjects.

The reference workflow this mirrors: ``PW_AL.Experiment_MultiImg``
(PW_AL.py:586-898) — one model, many training subjects; each round
queries a ``(voxel, subject)`` matrix from the union of per-subject grid
pools, finetunes on global batches drawn across subjects, and evaluates
mean F-measure on held-out test subjects.  Queries are journaled per
iteration (``queries/<iter>.txt``) with per-round timing files
(``AL_running_times/dt_<iter>``), so campaigns are crash-resumable.

Synthetic subjects stand in for the reference's NRRD/NIfTI datasets;
with real data, pass ``[(modality_volumes, mask), ...]`` loaded via
``data.io.SubjectRegistry`` / ``data.formats``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(root_dir: str, method: str = "entropy", nqueries: int = 24,
         tiny: bool = False) -> dict:
    import numpy as np

    from nnal_tpu.core.config import ExperimentConfig
    from nnal_tpu.data.io import synthetic_subject
    from nnal_tpu.engine.multi_experiment import MultiImgExperiment

    if tiny:
        shape, n_train, nqueries = (20, 20, 6), 2, min(nqueries, 6)
        pars = {"model_name": "PW", "nclass": 2, "patch_shape": (9, 9, 1),
                "grid_spacing": 5, "k": 3, "B": 12, "ntb": 256, "b": 32,
                "epochs": 2, "MC_iters": 2, "learning_rate": 3e-4,
                "optimizer_name": "Adam", "dropout_rate": 0.2,
                "init_size": 6}
    else:
        shape, n_train = (40, 40, 12), 3
        pars = {"model_name": "PW", "nclass": 2, "patch_shape": (11, 11, 1),
                "grid_spacing": 2, "k": 8, "B": 200, "ntb": 1024, "b": 64,
                "epochs": 15, "MC_iters": 3, "learning_rate": 1e-3,
                "optimizer_name": "Adam", "dropout_rate": 0.5,
                "init_size": 24}

    train = [synthetic_subject(shape=shape, n_modalities=2, n_blobs=8,
                               seed=s) for s in range(n_train)]
    test = [synthetic_subject(shape=shape, n_modalities=2, n_blobs=8,
                              seed=100)]
    expr = MultiImgExperiment(root_dir, ExperimentConfig.from_pars(pars))
    expr.attach_subjects(train, test_subjects=test)
    expr.prep_data()
    expr.add_method(method)
    res = expr.run_method(method, nqueries)
    print(f"{method}: {res['n_queries']} queries across {n_train} "
          f"subjects; mean test-F per round:",
          [round(float(v), 3) for v in np.atleast_1d(res["perf"])])
    # the journal is a 2 x k (voxel, subject) matrix per round — the
    # reference's Q_mat (PW_AL.py:857-885)
    from nnal_tpu.core.journal import load_inds

    q0 = load_inds(os.path.join(root_dir, method, "queries", "0.txt"),
                   matrix=True)
    print("round-0 (voxel, subject) queries:",
          list(zip(q0[0, :3].tolist(), q0[1, :3].tolist())), "...")
    return res


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("root_dir", nargs="?",
                    default="/tmp/nnal_multi_subject_al")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--method", default="entropy")
    ap.add_argument("--nqueries", type=int, default=24)
    a = ap.parse_args()
    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    main(a.root_dir, a.method, a.nqueries, a.tiny)
