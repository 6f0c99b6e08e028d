"""Repeat-run statistical harness.

Rebuild of ``resetting_run.py``: N repeated runs of a method comparison,
resumable via ``counter.txt``, per-run durations appended to
``durations.txt``.  No IPython state-reset gymnastics are needed — each run
is just a fresh experiment directory.
"""

from __future__ import annotations

import os
import sys
import time

from nnal_tpu.cli.expr_handler import do_expr


def repeat_runs(root_dir: str, methods, nqueries: int, n_runs: int = 10,
                overrides: str = "", synthetic: bool = True):
    os.makedirs(root_dir, exist_ok=True)
    counter_path = os.path.join(root_dir, "counter.txt")
    start = 0
    if os.path.exists(counter_path):
        start = int(open(counter_path).read().strip())
    for run in range(start, n_runs):
        t0 = time.time()
        run_root = os.path.join(root_dir, f"run_{run}")
        ov = overrides + (("," if overrides else "") + f"seed={run}")
        for method in methods:
            do_expr(run_root, method, nqueries, ov, synthetic=synthetic)
        with open(os.path.join(root_dir, "durations.txt"), "a") as f:
            f.write(f"{run} {time.time() - t0:.2f}\n")
        with open(counter_path, "w") as f:
            f.write(str(run + 1))


def main(argv=None):
    from nnal_tpu.core.platform import honor_env_platforms

    honor_env_platforms()
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 3:
        print("usage: repeat_runs.py <root> <methods,comma-sep> <nqueries> "
              "[n_runs] [overrides]")
        return 1
    root, methods, nq = argv[0], argv[1].split(","), int(argv[2])
    n_runs = int(argv[3]) if len(argv) > 3 else 10
    overrides = argv[4] if len(argv) > 4 else ""
    repeat_runs(root, methods, nq, n_runs, overrides)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
