"""Sharded training and pool scoring over a device mesh.

New first-class components replacing the reference's single ``tf.Session``
(SURVEY.md §2.7 table):

* **DP**: batches sharded over the ``data`` axis; gradient psum is inserted
  by GSPMD from the sharding annotations (no hand-written all-reduce).
* **TP hooks**: the PW1/VGG FC stack is where the parameters live
  (fc1/fc2 are 4096-wide); fc1 is column-parallel (out-dim sharded on
  ``model``), fc2 row-parallel (in-dim sharded), fc3 replicated — the
  Megatron split expressed purely as PartitionSpecs.
* **Sharded pool scoring + top-k**: per-shard ``lax.top_k`` inside
  ``shard_map``, then an all-gather of the k·n_shards candidates and a final
  top-k — the communication-optimal selection for pools sharded across ICI
  (SURVEY.md §2.7 "pool sharding").
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nnal_tpu.models.cnn import apply_cnn
from nnal_tpu.models.losses import cross_entropy

# TP plan for the spec-CNN FC stack: name -> (W spec, b spec)
_TP_FC_PLAN = {
    "fc1": (P(None, "model"), P("model")),
    "fc2": (P("model", None), P(None)),
}


def param_partition_specs(params: Dict, tensor_parallel: bool = True) -> Dict:
    """PartitionSpec pytree: conv kernels replicated, FC stack TP-sharded."""
    specs = {}
    for name, layer in params.items():
        layer_specs = {}
        for k, v in layer.items():
            if tensor_parallel and name in _TP_FC_PLAN and k in ("W", "b"):
                layer_specs[k] = _TP_FC_PLAN[name][0 if k == "W" else 1]
            else:
                layer_specs[k] = P()
        specs[name] = layer_specs
    return specs


def shard_params(params: Dict, mesh: Mesh,
                 tensor_parallel: bool = True) -> Dict:
    specs = param_partition_specs(params, tensor_parallel)
    return jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)),
        params, specs)


def make_sharded_train_step(spec, mesh: Mesh, tx,
                            tensor_parallel: bool = True):
    """DP(+TP) train step: batch sharded on ``data``, params per the TP
    plan; GSPMD derives the psum/all-gather schedule."""
    import optax

    pspecs = param_partition_specs(spec_params_template(spec),
                                   tensor_parallel)
    batch_sharding = NamedSharding(mesh, P("data"))
    param_shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), pspecs)

    def step(params, opt_state, x, y, rng):
        def loss_fn(p):
            out = apply_cnn(spec, p, x, train=True, dropout_rng=rng)
            return cross_entropy(out.logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(param_shardings, None, batch_sharding,
                      batch_sharding, None),
        out_shardings=(param_shardings, None, None),
    )


def spec_params_template(spec):
    """Shape-only param template (for building partition specs without
    materializing weights)."""
    from nnal_tpu.models.cnn import init_cnn

    params, _ = jax.eval_shape(lambda k: init_cnn(spec, k),
                               jax.random.key(0))
    return params


def _local_then_global_topk(scores: jnp.ndarray, k: int,
                            mesh_axis: str = "data"):
    """Inside shard_map: per-shard top-k, all_gather candidates, global
    top-k over the gathered k * n_shards values."""
    vals, idx = jax.lax.top_k(scores, k)
    shard = jax.lax.axis_index(mesh_axis)
    global_idx = idx + shard * scores.shape[0]
    all_vals = jax.lax.all_gather(vals, mesh_axis, tiled=True)
    all_idx = jax.lax.all_gather(global_idx, mesh_axis, tiled=True)
    top_vals, pos = jax.lax.top_k(all_vals, k)
    return top_vals, all_idx[pos]


def sharded_pool_topk(mesh: Mesh, score_fn, k: int):
    """Build a pjit'd ``(params, patches) -> (top_scores, top_global_idx)``
    where ``patches`` is sharded over ``data`` and ``score_fn(params, x)``
    returns per-patch scores (larger = selected)."""
    from jax.experimental.shard_map import shard_map

    def sharded(params, patches):
        def local(params, x):
            s = score_fn(params, x)
            return _local_then_global_topk(s, k)

        return shard_map(
            local, mesh=mesh,
            in_specs=(P(), P("data")),
            out_specs=(P(), P()),
            check_rep=False)(params, patches)

    return jax.jit(sharded)
