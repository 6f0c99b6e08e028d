"""Pre-compile the standard campaign programs into the persistent XLA
compilation cache while the device is healthy.

Cold campaigns on a fresh box eat the remote-compile storm in their first
round (~60-70 s of select latency, docs/PERFORMANCE.md); the persistent
cache fixes the SECOND campaign but nothing primed the first.  This tool
runs a one-query micro-campaign per requested method at the exact
campaign shapes (128x128x32 volumes, 2 modalities, PW1 25x25x2, the
standard bucket sizes) — compiling the identical programs the real
campaign will request: the grid posterior sweep, the fused FIM/gradient
programs, the scanned finetune at bucket 256, and the test-eval sweep.
Program cache keys hash shapes + HLO, so a primed key is a guaranteed hit
for the matching campaign config.

    python -m nnal_tpu.cli.wait_device --prime && \
        NNAL_COMPILE_CACHE=1 python benchmarks/campaigns.py r04 fi

Usage: python -m nnal_tpu.cli.prime_cache [--methods entropy,fi]
           [--pars k1=v1,k2=v2]   # campaign-par overrides
Exit code 0 on success.  TPU-native ops concern — no reference analog.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

# campaign-protocol parameters (benchmarks/campaigns.py PARS) — priming
# must match them exactly or the cache keys differ
SHAPE = (128, 128, 32)
PARS = {
    "model_name": "PW", "nclass": 2, "patch_shape": (25, 25, 1),
    "grid_spacing": 2, "k": 1, "B": 128, "ntb": 4096, "b": 64,
    "epochs": 15, "MC_iters": 5, "learning_rate": 1e-3,
    "optimizer_name": "Adam", "dropout_rate": 0.5, "init_size": 16,
    "n_ensemble": 3, "seed": 11, "dtype": "bfloat16",
}


def prime(methods, pars_over=None, n_modalities: int = 2,
          n_subjects: int = 3, verbose: bool = True) -> dict:
    """Run a 1-query micro-campaign per method through the multi-subject
    engine — the engine constructs the same evaluators and jitted
    programs the full campaign uses; with the persistent cache enabled
    every compile lands on disk.  Returns {method: seconds}.

    ``n_subjects`` MUST match the target campaign (default 3 = the
    benchmarks/campaigns.py protocol): the global uncertainty-filter
    programs run on the CONCATENATED pool, so a 1-subject prime compiles
    a different-shape filter and the campaign still pays its compile at
    round 0 (measured: fresh-cache 1-subject prime left influence's
    round-0 filter at 27 s while its CG dropped 26.5 -> 2.8 s)."""
    from nnal_tpu.core.compile_cache import enable_compilation_cache
    from nnal_tpu.core.config import ExperimentConfig
    from nnal_tpu.data.io import synthetic_subject
    from nnal_tpu.engine.multi_experiment import MultiImgExperiment

    enable_compilation_cache()
    pars = dict(PARS)
    pars.update(pars_over or {})
    timings = {}
    for method in methods:
        t0 = time.perf_counter()
        with tempfile.TemporaryDirectory() as root:
            expr = MultiImgExperiment(root,
                                      ExperimentConfig.from_pars(pars))
            subs = [synthetic_subject(shape=SHAPE,
                                      n_modalities=n_modalities,
                                      n_blobs=10, seed=si)
                    for si in range(n_subjects)]
            test = [synthetic_subject(shape=SHAPE,
                                      n_modalities=n_modalities,
                                      n_blobs=10, seed=9)]
            expr.attach_subjects(subs, test_subjects=test)
            expr.prep_data()
            j = expr.add_method(method)
            # seed a small labeled set: influence/fi need one, and the
            # bucket-padded programs are shape-identical either way
            _, pg = j.membership()
            j.init_membership(pg[:8], pg[8:])
            expr.run_method(method, int(pars.get("k", 1)))
        timings[method] = round(time.perf_counter() - t0, 1)
        if verbose:
            print(f"primed {method}: {timings[method]} s", flush=True)
    return timings


def main(argv=None) -> int:
    from nnal_tpu.core.config import set_parameters

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--methods", default="entropy,fi,influence",
                    help="comma-separated query methods to prime")
    ap.add_argument("--n-subjects", type=int, default=3,
                    help="training-subject count — must match the target "
                         "campaign (concatenated-pool program shapes)")
    ap.add_argument("--pars", default="",
                    help="campaign-par overrides, key=val,key=val")
    ap.add_argument("--modalities", type=int, default=2)
    args = ap.parse_args(argv)
    over = set_parameters(dict(PARS), args.pars)
    prime([m for m in args.methods.split(",") if m],
          pars_over=over, n_modalities=args.modalities,
          n_subjects=args.n_subjects)
    return 0


if __name__ == "__main__":
    sys.exit(main())
