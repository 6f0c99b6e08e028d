"""Demo: active learning beats random on a dense synthetic subject.

Runs nine AL campaigns (entropy, MC-entropy, BALD, BatchBALD, fi,
influence, core-set, BADGE, random) on a synthetic brain-like volume with
enough foreground for the F-measure to be informative, and saves
``docs/learning_curves.png`` + ``docs/learning_curves.json`` (the exact
values docs quote).  ~15 min on a warm-cache TPU chip; runs on CPU too
(slower — fi/influence/core-set are compile-heavy).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nnal_tpu.core.platform import honor_env_platforms  # noqa: E402

honor_env_platforms()


def main():
    import numpy as np

    from nnal_tpu.cli.expr_handler import DEMO_CAMPAIGN_OVERRIDES, do_expr
    from nnal_tpu.evaluation.visualize import plot_learning_curves

    import tempfile

    overrides = DEMO_CAMPAIGN_OVERRIDES
    curves = {}
    with tempfile.TemporaryDirectory() as root:
        for method in ("entropy", "MC-entropy", "BALD", "BatchBALD", "fi",
                       "influence", "core-set", "BADGE", "random"):
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
