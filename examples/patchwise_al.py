"""Single-subject patch-wise active learning, end to end.

The reference workflow this mirrors: ``expr_handler.do_expr`` driving
``PW_AL.Experiment.run_method`` (reference expr_handler.py:11-28,
PW_AL.py:278-498) — query -> label -> finetune -> evaluate rounds on one
subject, with the experiment directory as the resumable journal.

Here the subject is synthetic (smooth multi-modal volumes with ellipsoid
blob masks), so the script runs anywhere.  It compares two strategies and
prints their F-measure learning curves; swap the method names for any of:
random, ps-random, entropy, MC-entropy, BALD, rep-entropy, core-set,
ensemble, QBC-JS, fi, influence, AU_4U, SuPix — plus the TPU-native
extras BADGE and BatchBALD.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(root_dir: str, methods=("entropy", "random"), nqueries: int = 60,
         tiny: bool = False) -> dict:
    import numpy as np

    from nnal_tpu.cli.expr_handler import DEMO_CAMPAIGN_OVERRIDES, do_expr

    if tiny:
        overrides = ("patch_shape=[9,9,1],grid_spacing=4,k=5,B=30,ntb=256,"
                     "b=32,epochs=2,MC_iters=2,init_size=6,"
                     "learning_rate=1e-3,optimizer_name=Adam,"
                     "synthetic_shape=[24,24,8],synthetic_blobs=6")
        nqueries = min(nqueries, 10)
    else:
        # the documented campaign protocol (epochs >= 15 rationale lives
        # with the constant)
        overrides = DEMO_CAMPAIGN_OVERRIDES

    curves = {}
    for method in methods:
        res = do_expr(os.path.join(root_dir, method), method, nqueries,
                      overrides, synthetic=True)
        curves[method] = np.asarray(res["perf"])
        print(f"{method:12s} F-measure per round:",
              [round(float(v), 3) for v in curves[method]])
    return curves


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("root_dir", nargs="?", default="/tmp/nnal_patchwise_al")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--methods", default="entropy,random")
    ap.add_argument("--nqueries", type=int, default=60)
    a = ap.parse_args()
    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    main(a.root_dir, tuple(a.methods.split(",")), a.nqueries, a.tiny)
