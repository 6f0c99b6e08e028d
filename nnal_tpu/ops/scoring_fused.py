"""Fused pool scoring: posterior + uncertainty + diag-FIM in one program.

This is the benchmark workhorse (BASELINE.md: "pool patches scored/sec/chip
(posterior + diag-FIM)").  The reference's equivalent is three separate
host-driven loops — posterior sweep, per-sample gradient sess.runs, A-matrix
assembly (SURVEY.md §3.2 hot loops).  Here one jitted program takes a patch
block and emits, per patch:

* binary posterior p1 and uncertainty |p1 - 0.5|,
* the L-vector of 'sum'-shrunk per-class log-posterior gradients
  (epsilon trick, see scoring.gradients) — i.e. the diag-FIM/A-matrix
  ingredients,

with the forward run in bfloat16 (MXU) and reductions in f32.  XLA fuses
the elementwise tail into the conv/matmul epilogues; everything stays in
HBM until the k selected indices leave the device.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from nnal_tpu.models.cnn import apply_cnn
from nnal_tpu.scoring.gradients import grad_param_layers, layer_sizes


@partial(jax.jit, static_argnames=("spec", "with_fim"))
def pool_score_fused(spec, params, patches: jnp.ndarray,
                     with_fim: bool = True):
    """Returns dict with ``p1``, ``uncertainty`` and (optionally) ``shrunk``
    — the (b, c, L) shrunk class-gradients feeding diag-FIM/A-matrices."""
    names = grad_param_layers(spec, params)
    sizes = jnp.asarray(layer_sizes(spec, params), jnp.float32)

    def fwd_logits(p, x):
        return apply_cnn(spec, p, x).logits

    if not with_fim:
        logits = fwd_logits(params, patches)
        post = jax.nn.softmax(logits, axis=-1)
        p1 = post[:, 1]
        return {"p1": p1, "uncertainty": jnp.abs(p1 - 0.5)}

    def f(eps, xi, c):
        perturbed = dict(params)
        for j, n in enumerate(names):
            layer = dict(params[n])
            # cast the f32 epsilon into the parameter dtype so the bf16
            # forward stays on the MXU; the gradient casts back to f32
            layer["W"] = params[n]["W"] + eps[j].astype(params[n]["W"].dtype)
            layer["b"] = params[n]["b"] + eps[j].astype(params[n]["b"].dtype)
            perturbed[n] = layer
        logits = fwd_logits(perturbed, xi[None])
        return jax.nn.log_softmax(logits, axis=-1)[0, c], logits[0]

    g = jax.grad(f, has_aux=True)
    eps0 = jnp.zeros((len(names),), jnp.float32)
    nclass = spec.nclass

    def per_sample(xi):
        outs = jax.vmap(lambda c: g(eps0, xi, c))(jnp.arange(nclass))
        shrunk = outs[0] / sizes          # (c, L)
        logits = outs[1][0]               # same logits per class
        return shrunk, logits

    shrunk, logits = jax.vmap(per_sample)(patches)
    post = jax.nn.softmax(logits, axis=-1)
    p1 = post[:, 1]
    return {"p1": p1, "uncertainty": jnp.abs(p1 - 0.5), "shrunk": shrunk}


def make_pool_scorer(spec, compute_dtype=jnp.bfloat16, with_fim: bool = True):
    """Pool scorer with bf16 parameter/patch cast fused in (MXU path)."""
    @partial(jax.jit, static_argnames=())
    def scorer(params, patches):
        p16 = jax.tree_util.tree_map(
            lambda v: v.astype(compute_dtype), params)
        return pool_score_fused(spec, p16, patches.astype(compute_dtype),
                                with_fim)
    return scorer
