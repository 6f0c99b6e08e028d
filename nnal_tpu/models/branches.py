"""Model branches and replication.

Reference: ``create_branch`` grows a secondary head off a probed layer of a
built graph (NN_extended.py:1085-1118) and ``replicate_model`` clones a
graph under a new variable scope (NN_extended.py:1677).  Functionally both
are trivial under JAX — a branch is just a second spec applied to a probe
activation, and replication is a pytree copy — but the seams are kept
first-class so experiments can express the same architectures.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from nnal_tpu.models.cnn import CNNOutput, apply_cnn, init_cnn
from nnal_tpu.models.specs import CNNSpec


def branch_input_shape(trunk: CNNSpec, probe_index: int) -> Tuple[int, ...]:
    """Sample shape of the probed layer's output (to size a branch spec)."""
    from nnal_tpu.models.cnn import _trace_shapes

    return tuple(_trace_shapes(trunk)[probe_index]["out_shape"])


def init_branch(branch: CNNSpec, key):
    return init_cnn(branch, key)


def apply_with_branch(trunk: CNNSpec, branch: CNNSpec, trunk_params: Dict,
                      branch_params: Dict, x, probe_index: int, **kw
                      ) -> Tuple[CNNOutput, CNNOutput]:
    """Forward through the trunk, then run the branch head on the probed
    activation.  ``probe_index`` must be listed in ``trunk.probes``."""
    assert probe_index in trunk.probes, \
        f"layer {probe_index} is not probed by {trunk.name}"
    trunk_out = apply_cnn(trunk, trunk_params, x, **kw)
    probe_name = trunk.layers[probe_index].name
    h = trunk_out.probes[probe_name]
    branch_out = apply_cnn(branch, branch_params, h, **kw)
    return trunk_out, branch_out


def replicate_params(params: Dict) -> Dict:
    """Deep copy of a parameter pytree (reference ``replicate_model`` —
    a second 'graph' is just independent arrays here)."""
    return jax.tree_util.tree_map(jnp.array, params)
