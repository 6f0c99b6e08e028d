"""Multi-host (DCN) story: jax.distributed init + a process-spanning mesh
(SURVEY.md §2.7 / round-1 verdict missing #9).

Two real OS processes, each with 4 virtual CPU devices, form one global
8-device mesh; a data-sharded global array is reduced across the process
boundary and a model-parallel matmul psums over the intra-host axis.
If this JAX build lacks cross-process CPU collectives the test skips with
the child's error (the API itself is still exercised up to init).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from nnal_tpu.parallel.multihost import (
    init_distributed, make_multihost_mesh, process_local_pool_slice)
init_distributed(f"localhost:{port}", 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


mesh = make_multihost_mesh(model_parallel=2)
assert dict(mesh.shape) == {"data": 4, "model": 2}

# --- cross-DCN reduction of a data-sharded global array ---
sh = NamedSharding(mesh, P("data"))
full = np.arange(8, dtype=np.float32)
x = jax.make_array_from_callback((8,), sh, lambda idx: full[idx])
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
got = float(np.asarray(total.addressable_data(0)))
assert got == 28.0, got

# --- model-parallel matmul: columns sharded on the intra-host axis ---
W = np.arange(16, dtype=np.float32).reshape(4, 4)
w = jax.make_array_from_callback(
    (4, 4), NamedSharding(mesh, P(None, "model")),
    lambda idx: W[idx])
v = jax.make_array_from_callback(
    (4,), NamedSharding(mesh, P()), lambda idx: np.ones(4, np.float32)[idx])
out = jax.jit(lambda w, v: v @ w,
              out_shardings=NamedSharding(mesh, P()))(w, v)
np.testing.assert_allclose(np.asarray(out.addressable_data(0)),
                           np.ones(4) @ W)

lo, hi = process_local_pool_slice(103)
assert (lo, hi) == ((0, 52) if pid == 0 else (52, 103))
print(f"MULTIHOST OK pid={pid}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_mesh():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, "-c", CHILD, str(pid), str(port)], env=env,
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("multi-process CPU collectives timed out in this "
                        "JAX build")
        outs.append((p.returncode, out))
    for rc, out in outs:
        if rc != 0 and ("not implemented" in out.lower()
                        or "unimplemented" in out.lower()
                        or "does not support" in out.lower()):
            pytest.skip(f"CPU cross-process collectives unsupported: "
                        f"{out[-500:]}")
        assert rc == 0, out[-3000:]
        assert "MULTIHOST OK" in out
