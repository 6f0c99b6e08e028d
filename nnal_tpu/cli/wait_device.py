"""Block until the TPU backend is responsive — the queued-hardware-jobs
guard for tunnel outages.

The dev tunnel can stall for hours, and a stalled backend hangs any
device RPC with no client deadline.  The working recovery pattern is a
watchdog that probes with a hard-timeout subprocess matmul and only then
launches the queued jobs:

    python -m nnal_tpu.cli.wait_device && python bench.py
    python -m nnal_tpu.cli.wait_device --max-wait 7200 || exit 3

Exit codes: 0 = responsive, 3 = --max-wait exceeded.
"""

from __future__ import annotations

import argparse
import sys

from nnal_tpu.core.device_probe import wait_for_device


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--probe-timeout", type=int, default=300,
                    help="hard timeout (s) for each subprocess probe "
                         "(remote compiles of a toy program can take "
                         "122-209 s under load)")
    ap.add_argument("--interval", type=int, default=120,
                    help="seconds between probes")
    ap.add_argument("--max-wait", type=float, default=0,
                    help="give up after this many seconds (0 = forever)")
    ap.add_argument("--prime", action="store_true",
                    help="after the device responds, pre-compile the "
                         "standard campaign programs into the persistent "
                         "compilation cache (cli.prime_cache) so a cold "
                         "box's first campaign skips the remote-compile "
                         "storm")
    ap.add_argument("--prime-methods", default="entropy,fi,influence",
                    help="methods to prime (with --prime)")
    args = ap.parse_args(argv)
    ok = wait_for_device(args.probe_timeout, args.interval, args.max_wait)
    if ok and args.prime:
        # subprocess: priming initializes a JAX backend; keep this
        # watchdog process clean so callers can chain more jobs after it
        import subprocess

        rc = subprocess.call([sys.executable, "-m",
                              "nnal_tpu.cli.prime_cache",
                              "--methods", args.prime_methods])
        if rc != 0:
            return rc
    return 0 if ok else 3


if __name__ == "__main__":
    sys.exit(main())
