"""Device-mesh construction.

The reference is single-device (SURVEY.md §2.7); all distribution here is
new, TPU-native design: a 2-axis ``Mesh`` — ``data`` for batch/pool
sharding, ``model`` for tensor-parallel FC shards — with XLA/GSPMD inserting
the collectives (psum over ``model`` for row-parallel matmuls, all-gathers
for the sharded top-k).  On a v5e-8 slice both axes ride ICI.
"""

from __future__ import annotations

import functools as _functools
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def default_mesh_shape(n_devices: int, model_parallel: int = 1
                       ) -> Tuple[int, int]:
    """(data, model) factorization; model axis must divide n_devices."""
    if n_devices % model_parallel:
        raise ValueError(f"model_parallel={model_parallel} must divide "
                         f"{n_devices}")
    return n_devices // model_parallel, model_parallel


def make_mesh(n_devices: Optional[int] = None,
              model_parallel: int = 1) -> Mesh:
    devices = jax.devices()
    if n_devices is not None and len(devices) < n_devices:
        # the default backend (e.g. the single-chip axon tunnel) is too
        # small — fall back to the CPU backend, whose virtual device count
        # honors --xla_force_host_platform_device_count
        devices = jax.devices("cpu")
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have "
                             f"{len(devices)}")
        devices = devices[:n_devices]
    dp, mp = default_mesh_shape(len(devices), model_parallel)
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, axis_names=("data", "model"))


@_functools.lru_cache(maxsize=None)
def cached_mesh(n_devices: Optional[int] = None,
                model_parallel: int = 1) -> Mesh:
    """Memoized :func:`make_mesh` — engines resolve the ``data_parallel``
    config key through this so repeated evaluator construction (one per
    ``run_method``) reuses one mesh object per size."""
    return make_mesh(n_devices, model_parallel)
