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
    args = ap.parse_args(argv)
    ok = wait_for_device(args.probe_timeout, args.interval, args.max_wait)
    return 0 if ok else 3


if __name__ == "__main__":
    sys.exit(main())
