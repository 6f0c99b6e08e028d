"""Multi-chip campaign: pool scoring sharded over a device mesh.

One config key — ``data_parallel=N`` — makes every grid-pool strategy
(entropy, MC-entropy, BALD, fi, AU_4U, committee sweeps, device-resident
core-set/rep-entropy features) score its pool across an N-device
``jax.sharding.Mesh``: each shard sweeps its z-slab of the volume with
the SAME per-chunk program as the single-device path, so selections are
**bit-identical** (``parallel/grid_sharded.py``; verified below).

The reference has no counterpart — it is a single ``tf.Session``
throughout (SURVEY.md §2.7).  On real hardware the mesh is a v5e slice;
here the script demonstrates the identical code path on 8 *virtual* CPU
devices, which is also how the repo's sharding tests run without a pod
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEVICES = 8


def _ensure_virtual_devices():
    """XLA_FLAGS must be set before the backend initializes — re-exec with
    the flag if this process started without it (or with a smaller
    device count, e.g. exported by another workflow)."""
    import re

    flags = os.environ.get("XLA_FLAGS", "")
    m = re.search(r"--xla_force_host_platform_device_count=(\d+)", flags)
    if m and int(m.group(1)) >= N_DEVICES:
        return
    if os.environ.get("_NNAL_MULTICHIP_REEXEC"):
        sys.exit(f"re-exec failed to obtain {N_DEVICES} virtual devices "
                 f"(XLA_FLAGS={os.environ.get('XLA_FLAGS')!r})")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   flags)
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEVICES}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["_NNAL_MULTICHIP_REEXEC"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)


def main(root_dir: str, tiny: bool = False, method: str = "entropy") -> None:
    import numpy as np

    from nnal_tpu.cli.expr_handler import do_expr

    nq = 10 if tiny else 30
    base = ("patch_shape=[9,9,1],grid_spacing=2,k=5,B=40,ntb=512,b=32,"
            "epochs=2,MC_iters=2,init_size=8,learning_rate=1e-3,"
            "optimizer_name=Adam,synthetic_shape=[24,24,8],"
            "synthetic_blobs=6")
    res8 = do_expr(os.path.join(root_dir, "dp8"), method, nq,
                   base + f",data_parallel={N_DEVICES}", synthetic=True)
    res1 = do_expr(os.path.join(root_dir, "dp1"), method, nq,
                   base + ",data_parallel=1", synthetic=True)
    print(f"{method} perf  dp={N_DEVICES}:",
          [round(float(v), 3) for v in res8["perf"]])
    print(f"{method} perf  dp=1:",
          [round(float(v), 3) for v in res1["perf"]])

    # the sharded sweep is not an approximation: per-round selections are
    # bit-identical to the single-device path
    for it in range(len(res8["perf"])):
        q8 = np.loadtxt(os.path.join(root_dir, "dp8", method, "queries",
                                     f"{it}.txt"), dtype=np.int64)
        q1 = np.loadtxt(os.path.join(root_dir, "dp1", method, "queries",
                                     f"{it}.txt"), dtype=np.int64)
        assert np.array_equal(q8, q1), f"round {it} selections diverged"
    print(f"all {len(res8['perf'])} rounds: dp={N_DEVICES} selections "
          f"bit-identical to dp=1")


if __name__ == "__main__":
    _ensure_virtual_devices()

    import argparse

    import jax

    # the env var alone can be overridden by site configuration; the
    # config update after import always wins
    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= N_DEVICES

    ap = argparse.ArgumentParser()
    ap.add_argument("root_dir", nargs="?", default="/tmp/nnal_multichip")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--method", default="entropy")
    # accepted for uniformity with the other examples; this script always
    # runs on the virtual CPU mesh
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    main(a.root_dir, a.tiny, a.method)
