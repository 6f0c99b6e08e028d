"""Dense-model (FC-DenseNet / Tiramisu) active learning, end to end.

The reference's v2 model family predicts every pixel of a slice in one
forward pass (``NN_extended.py`` FCN heads; ``FCDenseNet_103Layers``,
create_NN.py:211).  This example drives that family through the SAME
``PWExperiment`` engine the patch-wise flows use — the config's
``model_name: Tiramisu`` switches the engine to whole-slice dense pool
scoring (``scoring/fcn_eval.FCNGridPoolEvaluator``) and
queried-voxel-masked dense finetunes (``models/train.
make_scanned_finetune_fcn``), with per-round BN running-stat refresh.

Strategy surface on dense specs: the uncertainty family (entropy,
MC-entropy, BALD, BatchBALD, random) and the feature-space family
(core-set, rep-entropy, BADGE — per-pixel probe features, r5).
Per-patch gradient methods (fi, influence) need the patch-wise
evaluator and raise a clear error.

Optional extras shown here:
- ``--mt`` turns on dense mean-teacher SSL (whole-slice unlabeled
  consistency inside the finetune scan) with the labeled-count
  ramp-down (``consistency_off_labels``) so the semi-supervised boost
  applies at low budgets and switches off as labels accumulate.
- heterogeneous subjects: the fully-convolutional spec shares one
  parameter set across slice shapes (see ``multi_subject_al.py`` for
  the multi-subject engine; shapes may differ per subject).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(root_dir, methods=("entropy", "BADGE"), nqueries=24,
         tiny=True, mt=False):
    import numpy as np

    from nnal_tpu.core.config import ExperimentConfig
    from nnal_tpu.data.io import synthetic_subject
    from nnal_tpu.engine.pw_experiment import PWExperiment

    shape = (24, 24, 8) if tiny else (128, 128, 32)
    pars = {
        "model_name": "Tiramisu", "nclass": 2,
        # growth/depths size the FC-DenseNet; the serving-proven
        # 103-layer config is growth=16 depths=(4,5,7,10,12,15)
        "model_kwargs": ({"growth": 4, "depths": [2, 2]} if tiny
                         else {"growth": 8, "depths": [3, 4, 5]}),
        "patch_shape": (9, 9, 1),     # engine bookkeeping only (fcn
                                      # consumes whole slices)
        "grid_spacing": 4 if tiny else 2,
        "k": 4 if tiny else 32, "B": 16 if tiny else 128,
        "ntb": 256, "b": 4, "epochs": 2 if tiny else 25,
        "MC_iters": 2 if tiny else 5,
        "learning_rate": 1e-3, "optimizer_name": "Adam",
        "dropout_rate": 0.1, "init_size": 6 if tiny else 64, "seed": 3,
    }
    if mt:
        pars.update({"consistency_coeff": 0.5,
                     "consistency_measure": "MSE",
                     "consistency_ramp": 8, "unlabeled_batch": 2,
                     # full-strength MT below 24 labels, off at 48
                     "consistency_off_labels": 48})
    vols, mask = synthetic_subject(shape=shape, n_modalities=2,
                                   n_blobs=6 if tiny else 10, seed=0)
    curves = {}
    for method in methods:
        expr = PWExperiment(os.path.join(root_dir, method),
                            ExperimentConfig.from_pars(dict(pars)))
        expr.attach_subject(vols, mask)
        expr.prep_data()
        expr.add_method(method)
        res = expr.run_method(method, nqueries)
        curves[method] = np.asarray(res["perf"])
        print(f"{method:12s} F-measure per round:",
              [round(float(v), 3) for v in curves[method]])
    return curves


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("root_dir", nargs="?",
                    default="/tmp/nnal_dense_model_al")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mt", action="store_true")
    ap.add_argument("--methods", default="entropy,BADGE")
    ap.add_argument("--nqueries", type=int, default=24)
    a = ap.parse_args()
    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    main(a.root_dir, tuple(a.methods.split(",")), a.nqueries, a.tiny,
         a.mt)
