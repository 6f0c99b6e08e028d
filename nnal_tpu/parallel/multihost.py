"""Multi-host (DCN) runtime: ``jax.distributed`` init + process-spanning
meshes.

The reference is single-process (SURVEY.md §2.7); single-slice ICI was the
round-1 scope.  This module adds the multi-host story: each host process
calls :func:`init_distributed`, then :func:`make_multihost_mesh` builds one
global ``Mesh`` over every process's devices with the **process (DCN) axis
outermost** — so data-parallel gradient ``psum`` reduces hierarchically
(intra-host ICI first, one cross-host hop per step) and the ``model`` axis
never leaves a host.  Pool sharding follows the same rule: each host scores
its local pool shard, the global top-k runs one small cross-DCN all-gather
of per-shard candidates (``parallel.pool_sharded`` works unchanged on a
multihost mesh).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def init_distributed(coordinator_address: str, num_processes: int,
                     process_id: int,
                     local_device_ids: Optional[Tuple[int, ...]] = None
                     ) -> None:
    """Initialize the JAX distributed runtime for one host process.  Must
    run before the first backend touch in every process.  Idempotent."""
    import jax
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)


def make_multihost_mesh(model_parallel: int = 1):
    """Global mesh over all processes' devices: ``(data, model)`` with the
    process dimension folded into ``data`` (outermost), so DCN carries only
    the data-parallel reduction and the model axis stays on-host ICI.
    Works unchanged in single-process runs."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()              # globally consistent order
    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    if model_parallel > n_local:
        raise ValueError(
            f"model_parallel={model_parallel} would span hosts "
            f"({n_local} local devices) — the model axis must ride ICI")
    if n_local % model_parallel:
        raise ValueError(f"model_parallel={model_parallel} must divide "
                         f"local device count {n_local}")
    arr = np.asarray(devices).reshape(n_proc * n_local // model_parallel,
                                      model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def process_local_pool_slice(n_pool: int) -> Tuple[int, int]:
    """[lo, hi) of the global pool owned by this process — hosts feed only
    their own shard (per-host IO, no cross-host data movement before the
    candidate all-gather)."""
    import jax

    pid, nproc = jax.process_index(), jax.process_count()
    per = -(-n_pool // nproc)
    lo = min(pid * per, n_pool)
    return lo, min(lo + per, n_pool)
