"""Demo: active learning beats random on a dense synthetic subject.

Runs entropy vs random AL campaigns on a synthetic brain-like volume with
enough foreground for the F-measure to be informative, and saves
``docs/learning_curves.png``.  CPU-friendly (a few minutes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    from nnal_tpu.cli.expr_handler import do_expr
    from nnal_tpu.evaluation.visualize import plot_learning_curves

    import tempfile

    # epochs >= 15: with tens of labels and b=64 an epoch is 1-2 Adam
    # steps, and shorter training can pin a method in its initial
    # one-class regime (F=0 forever) — the campaign-protocol lesson
    # documented in CLAUDE.md / benchmarks/campaigns.py
    overrides = ("patch_shape=[11,11,1],grid_spacing=2,k=20,B=200,"
                 "ntb=1024,b=64,epochs=15,init_size=40,seed=3,"
                 "learning_rate=1e-3,optimizer_name=Adam,MC_iters=3,"
                 "synthetic_shape=[40,40,12],synthetic_blobs=8")
    curves = {}
    with tempfile.TemporaryDirectory() as root:
        for method in ("entropy", "MC-entropy", "BALD", "fi", "influence",
                       "core-set", "random"):
            res = do_expr(os.path.join(root, method), method, 100,
                          overrides, synthetic=True)
            curves[method] = np.asarray(res["perf"])
            print(method, [round(float(v), 3) for v in curves[method]])
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "learning_curves.png")
    plot_learning_curves(curves, 20, out)
    # persist the exact values next to the plot so docs that quote them
    # stay traceable to an artifact
    import json

    with open(os.path.join(out_dir, "learning_curves.json"), "w") as f:
        json.dump({"overrides": overrides, "k_per_round": 20,
                   "curves": {m: [round(float(v), 4) for v in c]
                              for m, c in curves.items()}}, f, indent=1)
    print("saved", out)


if __name__ == "__main__":
    main()
