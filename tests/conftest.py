"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4 item 4)."""

import os

# force CPU: the surrounding environment presets JAX_PLATFORMS=axon (the TPU
# tunnel) and a baked sitecustomize force-sets jax_platforms="axon,cpu" at
# jax import time, so the env var alone is not enough — the config must be
# re-updated after importing jax, before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# persistent XLA compilation cache across test runs AND the subprocess
# tests' children: the suite compiles the same PW1/finetune programs every
# run, which dominates gate wall time.  Cache keys hash program content, so
# code changes can't serve stale executables. NNAL_COMPILE_CACHE=0 disables.
# The env var alone only covers CHILD processes (their sitecustomize jax
# import reads it at interpreter startup); for THIS process jax was already
# imported by sitecustomize before conftest ran, so the config must be
# updated explicitly after import.
_cc = None
if os.environ.get("NNAL_COMPILE_CACHE", "") != "0":
    _cc = os.path.join(os.path.expanduser("~"), ".cache", "nnal_tpu",
                       "xla-cpu-tests")
    os.makedirs(_cc, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cc)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if _cc is not None:
    jax.config.update("jax_compilation_cache_dir", _cc)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
