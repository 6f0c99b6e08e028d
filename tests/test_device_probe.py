"""Device-backend health probe (core/device_probe.py) — the
tunnel-outage guard shared by bench.py and cli/wait_device.py."""

import time

from nnal_tpu.core.device_probe import device_responsive, wait_for_device


def test_probe_cpu_responsive(monkeypatch):
    """A healthy (CPU) backend answers the subprocess matmul probe; the
    probe honors JAX_PLATFORMS despite the sitecustomize reset."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert device_responsive(timeout_s=300)


def test_wait_for_device_gives_up(monkeypatch):
    """An unresponsive backend exhausts max_wait without ever hanging the
    parent.  A nonexistent platform name makes the probe child fail
    deterministically at backend init (machine-speed independent, unlike
    relying on jax-import time exceeding the probe timeout)."""
    monkeypatch.setenv("JAX_PLATFORMS", "nnal_no_such_backend")
    msgs = []
    t0 = time.monotonic()
    ok = wait_for_device(probe_timeout_s=30, interval_s=1, max_wait_s=4,
                         log=msgs.append)
    assert ok is False
    assert time.monotonic() - t0 < 120      # never blocked on the probe
    assert msgs and "unresponsive" in msgs[0]


def test_wait_device_cli(monkeypatch):
    # bounded --max-wait: if the CPU probe ever breaks in an environment,
    # the test must FAIL (exit 3), not hang the fast gate forever
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    from nnal_tpu.cli.wait_device import main

    assert main(["--interval", "1", "--max-wait", "600"]) == 0
