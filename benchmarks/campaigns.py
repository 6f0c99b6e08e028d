"""Real-scale engine campaigns on the local chip -> CAMPAIGNS_r{N}.json.

Same protocol as the r02 artifact: 128x128x32 volumes, 2 modalities,
grid_spacing 2 (131K-patch pools), PW1 25x25x2, 2 rounds of k=32,
n_ensemble=3, synthetic subjects with 10 blobs (dense enough for nonzero
F-curves).  Wall times include one-time XLA compiles.

Run: ``python benchmarks/campaigns.py [round_tag] [method ...]``
(default: the full method set; each campaign appends into the JSON as it
finishes, so partial runs are still recorded).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

SHAPE = (128, 128, 32)
PARS = {
    "model_name": "PW", "nclass": 2, "patch_shape": (25, 25, 1),
    "grid_spacing": 2, "k": 32, "B": 128, "ntb": 4096, "b": 64,
    "epochs": 1, "MC_iters": 5, "learning_rate": 3e-4,
    "optimizer_name": "Adam", "dropout_rate": 0.5, "init_size": 16,
    "n_ensemble": 3, "seed": 11, "dtype": "bfloat16",
}
MULTI_METHODS = ["fi", "core-set", "ensemble", "influence"]
SINGLE_METHODS = ["rep-entropy", "BALD", "AU_4U", "SuPix", "QBC-JS"]


def _subjects(n, seed0=0):
    from nnal_tpu.data.io import synthetic_subject

    return [synthetic_subject(shape=SHAPE, n_modalities=2, n_blobs=10,
                              seed=seed0 + s) for s in range(n)]


def run_single(method, out):
    from nnal_tpu.core.config import ExperimentConfig
    from nnal_tpu.engine.pw_experiment import PWExperiment

    with tempfile.TemporaryDirectory() as root:
        cfg = ExperimentConfig.from_pars(dict(PARS))
        expr = PWExperiment(root, cfg)
        vols, mask = _subjects(1)[0]
        expr.attach_subject(vols, mask)
        expr.prep_data()
        expr.add_method(method)   # init_size=16 seeds influence's labels
        t0 = time.perf_counter()
        res = expr.run_method(method, 64)
        dt = time.perf_counter() - t0
        rec = {"method": method, "queries": int(res["n_queries"]),
               "wall_s": round(dt, 1),
               "perf": [round(float(v), 3) for v in res["perf"]]}
        out["single_subject"].append(rec)
        print(json.dumps(rec), flush=True)


def run_multi(method, out):
    from nnal_tpu.core.config import ExperimentConfig
    from nnal_tpu.engine.multi_experiment import MultiImgExperiment

    with tempfile.TemporaryDirectory() as root:
        cfg = ExperimentConfig.from_pars(dict(PARS))
        expr = MultiImgExperiment(root, cfg)
        subs = _subjects(3)
        test = _subjects(1, seed0=9)
        expr.attach_subjects(subs, test_subjects=test)
        expr.prep_data()
        j = expr.add_method(method)
        if method == "influence":
            # influence needs a labeled set; seed a few global indices
            tg, pg = j.membership()
            seed = pg[:: max(1, len(pg) // 16)][:16]
            j.init_membership(seed, np.setdiff1d(pg, seed))
        t0 = time.perf_counter()
        res = expr.run_method(method, 64)
        dt = time.perf_counter() - t0
        rec = {"method": method, "queries": int(res["n_queries"]),
               "wall_s": round(dt, 1),
               "perf": [round(float(v), 3) for v in res["perf"]]}
        out["multi_subject_3x"].append(rec)
        print(json.dumps(rec), flush=True)


def main():
    args = sys.argv[1:]
    tag = args[0] if args and args[0].startswith("r") else "r03"
    methods = [a for a in args if not a.startswith("r")] or None
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"CAMPAIGNS_{tag}.json")
    out = {
        "hardware": "TPU v5e (axon tunnel, single chip)",
        "note": ("Full engine campaigns on real hardware: 128x128x32 "
                 "volumes, 2 modalities, grid_spacing 2 (131K-patch "
                 "pools), PW1 25x25x2, 2 rounds of k=32, n_ensemble=3, "
                 "10-blob subjects. Wall times include one-time XLA "
                 "compiles."),
        "multi_subject_3x": [], "single_subject": [],
    }
    if os.path.exists(path):
        out = json.load(open(path))
    for m in (methods or MULTI_METHODS):
        if m in MULTI_METHODS:
            run_multi(m, out)
            json.dump(out, open(path, "w"), indent=1)
    for m in (methods or SINGLE_METHODS):
        if m in SINGLE_METHODS:
            run_single(m, out)
            json.dump(out, open(path, "w"), indent=1)
    json.dump(out, open(path, "w"), indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
