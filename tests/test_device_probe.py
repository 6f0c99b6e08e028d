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
    """An unresponsive backend (probe killed by its hard timeout — the
    child can't even finish importing jax in 1 s) exhausts max_wait
    without ever hanging the parent."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    msgs = []
    t0 = time.monotonic()
    ok = wait_for_device(probe_timeout_s=1, interval_s=1, max_wait_s=8,
                         log=msgs.append)
    assert ok is False
    assert time.monotonic() - t0 < 60       # never blocked on the probe
    assert msgs and "unresponsive" in msgs[0]


def test_wait_device_cli(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    from nnal_tpu.cli.wait_device import main

    assert main(["--interval", "1"]) == 0
