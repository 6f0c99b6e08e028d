"""Device-backend health probe (tunnel-outage guard).

The dev environment reaches its TPU through a tunnel that can stall for
hours; a stalled backend hangs ANY device RPC indefinitely (the client
has no deadline) — even materializing ``jnp.ones((2,2))``.  The only safe
probe is a tiny matmul in a SUBPROCESS with a hard timeout: the parent
never touches the device, so it can't hang with it.

Shared by ``bench.py`` (fail-fast, exit 2) and the
``nnal_tpu.cli.wait_device`` watchdog (block until healthy, then hand off
to queued hardware jobs — the pattern that recovered the round-3 outage).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

# the baked sitecustomize resets jax_platforms to "axon,cpu" at jax
# import, so the child must re-apply JAX_PLATFORMS itself or a
# JAX_PLATFORMS=cpu probe would still target (and hang on) the tunnel
_PROBE = ("import os, jax, numpy as np; "
          "p = os.environ.get('JAX_PLATFORMS'); "
          "p and jax.config.update('jax_platforms', p); "
          "x = jax.numpy.ones((128, 128)); "
          "print(float(np.asarray(x @ x)[0, 0]))")


def device_responsive(timeout_s: int = 570) -> bool:
    """True iff a tiny matmul materializes on the default backend within
    ``timeout_s``.  Generous default: remote compiles of even a toy
    program have been observed taking 122-209 s under load."""
    try:
        subprocess.run([sys.executable, "-c", _PROBE], timeout=timeout_s,
                       check=True, capture_output=True)
        return True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        return False


def wait_for_device(probe_timeout_s: int = 300, interval_s: int = 120,
                    max_wait_s: float = 0, log=print) -> bool:
    """Block until the backend answers a probe; ``max_wait_s=0`` waits
    forever.  Returns True when healthy, False if the budget ran out."""
    t0 = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        if device_responsive(probe_timeout_s):
            if attempt > 1:
                log(f"device responsive after {attempt} probes "
                    f"({time.monotonic() - t0:.0f} s)")
            return True
        waited = time.monotonic() - t0
        if max_wait_s and waited + interval_s > max_wait_s:
            return False
        log(f"device unresponsive (probe {attempt}, {waited:.0f} s "
            f"elapsed) — retrying in {interval_s} s")
        time.sleep(interval_s)
