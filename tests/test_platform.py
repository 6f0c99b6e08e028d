"""honor_env_platforms (core/platform.py) — env var beats sitecustomize.

This box's sitecustomize re-pins jax_platforms to "axon,cpu" at jax
import, so the helper must re-apply JAX_PLATFORMS before backend init.
Needs a subprocess: the parent's backend is already initialized.
"""

import os
import subprocess
import sys

PROG = (
    "import jax\n"
    "from nnal_tpu.core.platform import honor_env_platforms\n"
    "applied = honor_env_platforms()\n"
    "assert applied == 'cpu', applied\n"
    "assert jax.devices()[0].platform == 'cpu'\n"
    "print('OK')\n"
)


def test_env_platforms_wins_over_sitecustomize():
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo")
    out = subprocess.run([sys.executable, "-c", PROG], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout


def test_noop_when_unset(monkeypatch):
    from nnal_tpu.core.platform import honor_env_platforms

    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    assert honor_env_platforms() is None
    monkeypatch.setenv("JAX_PLATFORMS", "  ")
    assert honor_env_platforms() is None
