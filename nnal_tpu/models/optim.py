"""Optimizers, schedules, and gradient masking.

Reference features rebuilt (NN_extended.py:881-927,1398-1459,1462-1519):
SGD / momentum / Adam / RMSProp; exponential-decay and sigmoid ramp
schedules; ``train_mask`` partial training by layer name; per-parameter
binary PFT masks multiplied into gradients.  Built on optax where a
primitive exists; masks are explicit tree transforms so they compose with
any optimizer.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax


# --------------------------------------------------------------------------- #
# schedules (reference NN_extended.py:1462-1519)
# --------------------------------------------------------------------------- #
def exponential_decay(lr0: float, decay_rate: float,
                      decay_steps: int = 1000) -> Callable:
    def sched(t):
        return lr0 * (decay_rate ** (t / decay_steps))
    return sched


def sigmoid_rampup(length: int) -> Callable:
    """exp(-5 (1 - t/length)^2), clamped to 1 after ``length`` (reference
    ``sigmoid_rampup`` used for the consistency coefficient)."""
    def sched(t):
        phase = jnp.clip(1.0 - t / length, 0.0, 1.0)
        return jnp.exp(-5.0 * phase ** 2)
    return sched


def sigmoid_rampdown(length: int, total: int) -> Callable:
    def sched(t):
        phase = jnp.clip((t - (total - length)) / length, 0.0, 1.0)
        return jnp.exp(-12.5 * phase ** 2)
    return sched


def constant(lr: float) -> Callable:
    return lambda t: lr


# --------------------------------------------------------------------------- #
# optimizers (reference get_optimizer, NN.py:557, NN_extended.py:1398)
# --------------------------------------------------------------------------- #
def make_optimizer(name: str = "SGD", learning_rate=1e-3,
                   beta1: float = 0.9, beta2: float = 0.999,
                   decay: float = 0.9, momentum: float = 0.0,
                   epsilon: float = 1e-10) -> optax.GradientTransformation:
    sched = learning_rate if callable(learning_rate) else float(learning_rate)
    if name == "SGD":
        return optax.sgd(sched, momentum=momentum or None)
    if name == "Adam":
        return optax.adam(sched, b1=beta1, b2=beta2)
    if name == "RMSProp":
        return optax.rmsprop(sched, decay=decay, eps=epsilon,
                             momentum=momentum)
    raise ValueError(name)


def layer_train_mask(params: Dict, train_layers: Sequence[str]) -> Dict:
    """0/1 mask pytree keeping only ``train_layers`` trainable (reference
    ``train_mask`` / var_list filtering; empty list = train everything)."""
    keep_all = len(train_layers) == 0
    return {
        name: {k: jnp.ones_like(v) if (keep_all or name in train_layers)
               else jnp.zeros_like(v) for k, v in layer.items()}
        for name, layer in params.items()
    }


def pft_mask_from_saliency(diag_fisher: Dict, k: int) -> Dict:
    """Partial-fine-tuning mask: 1 on the k globally-largest diagonal-Fisher
    entries (reference ``keep_k_largest_from_LoV``, model_utils.py:54-86,
    used with PFT_bflag)."""
    leaves, treedef = jax.tree_util.tree_flatten(diag_fisher)
    flat = np.concatenate([np.asarray(l).ravel() for l in leaves])
    if k <= 0:
        # keep the 0 largest = freeze everything (np.partition(flat, -0)
        # would select the global MINIMUM and unfreeze everything)
        thr = np.inf
    elif k >= flat.size:
        thr = -np.inf
    else:
        thr = np.partition(flat, -k)[-k]
    masked = [jnp.asarray((np.asarray(l) >= thr).astype(np.float32))
              for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, masked)


def pft_mask_from_threshold(diag_fisher: Dict, thr: float) -> Dict:
    """Threshold variant (reference ``threshold_LoV``,
    model_utils.py:88-96)."""
    return jax.tree_util.tree_map(
        lambda l: (l >= thr).astype(jnp.float32), diag_fisher)


def apply_grad_mask(grads: Dict, mask: Optional[Dict]) -> Dict:
    if mask is None:
        return grads
    return jax.tree_util.tree_map(lambda g, m: g * m, grads, mask)


# --------------------------------------------------------------------------- #
# EMA teacher (reference MT_SSL custom_getter EMA, NN_extended.py:1337-1396)
# --------------------------------------------------------------------------- #
@jax.jit
def ema_update(teacher_params: Dict, student_params: Dict,
               decay: float = 0.999) -> Dict:
    """ONE fused program for the whole tree — the eager per-leaf form
    dispatched ~3 ops per leaf per training step."""
    return jax.tree_util.tree_map(
        lambda t, s: decay * t + (1.0 - decay) * s,
        teacher_params, student_params)
