"""Loss library.

Covers the reference's loss family (NN_extended.py:1219-1396): CE,
CE-with-soft-classes, generalized CE (GCE), focal loss, binary class
weights, weighted-FCN CE with NaN-masked (unlabeled) voxels, aleatoric
attenuation, mean-teacher consistency, and LwF knowledge distillation
(model_utils.py:98-135).  All pure jittable functions of ``(logits, ...)``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy(logits, y_onehot, class_weights=None):
    """Mean softmax CE; optional per-class weights (reference
    ``bin_class_weights``)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    per = -jnp.sum(y_onehot * logp, axis=-1)
    if class_weights is not None:
        w = jnp.sum(y_onehot * jnp.asarray(class_weights), axis=-1)
        per = per * w
    return jnp.mean(per)


def soft_cross_entropy(logits, soft_targets):
    """CE against soft class distributions (reference 'CE_softclasses')."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(soft_targets * logp, axis=-1))


def generalized_ce(logits, y_onehot, q: float = 0.7):
    """GCE loss (1 - p_y^q)/q — noise-robust CE family (reference 'GCE')."""
    p = jax.nn.softmax(logits, axis=-1)
    py = jnp.sum(y_onehot * p, axis=-1)
    return jnp.mean((1.0 - jnp.clip(py, 1e-8) ** q) / q)


def focal_loss(logits, y_onehot, gamma: float = 2.0, class_weights=None):
    """Focal loss ``-(1-p_y)^gamma log p_y`` (reference ``focal_gamma``)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    per = -jnp.sum(y_onehot * ((1 - p) ** gamma) * logp, axis=-1)
    if class_weights is not None:
        w = jnp.sum(y_onehot * jnp.asarray(class_weights), axis=-1)
        per = per * w
    return jnp.mean(per)


def fcn_cross_entropy(logits, mask_onehot, class_weights=None,
                      focal_gamma: Optional[float] = None):
    """Dense-prediction CE over per-voxel one-hot masks with NaN-labeled
    voxels excluded (reference ``get_FCN_loss``, NN_extended.py:1285-1336;
    unlabeled voxels carry NaN one-hots, datasets/utils.py:93-202).

    ``logits``: (b, *spatial, c); ``mask_onehot`` same shape, possibly NaN.
    """
    valid = ~jnp.isnan(jnp.sum(mask_onehot, axis=-1))
    y = jnp.nan_to_num(mask_onehot)
    logp = jax.nn.log_softmax(logits, axis=-1)
    if focal_gamma is not None:
        p = jnp.exp(logp)
        per = -jnp.sum(y * ((1 - p) ** focal_gamma) * logp, axis=-1)
    else:
        per = -jnp.sum(y * logp, axis=-1)
    if class_weights is not None:
        w = jnp.sum(y * jnp.asarray(class_weights), axis=-1)
        per = per * w
    per = jnp.where(valid, per, 0.0)
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(per) / n


def aleatoric_ce_per_sample(logits, log_sigma, y_onehot, rng,
                            mc_t: int = 10):
    """Per-sample heteroscedastic CE over ``mc_t`` logit-noise samples
    ``z = logits + sigma * eps`` (reference AU_4L path,
    NN_extended.py:1520-1562 ``corrupt_output...``/``MC_T``).
    ``log_sigma`` is clamped so an untrained/diverging sigma head cannot
    overflow ``exp`` into NaN losses."""
    sigma = jnp.exp(jnp.clip(log_sigma, -10.0, 10.0))

    def one(key):
        eps = jax.random.normal(key, logits.shape, logits.dtype)
        z = logits + sigma * eps
        logp = jax.nn.log_softmax(z, axis=-1)
        return -jnp.sum(y_onehot * logp, axis=-1)

    keys = jax.random.split(rng, mc_t)
    return jnp.mean(jax.vmap(one)(keys), axis=0)


def aleatoric_ce(logits, log_sigma, y_onehot, rng, mc_t: int = 10):
    """Mean heteroscedastic classification loss (see per-sample form)."""
    return jnp.mean(aleatoric_ce_per_sample(logits, log_sigma, y_onehot,
                                            rng, mc_t))


def consistency_loss(student_logits, teacher_logits, measure: str = "CE"):
    """Mean-teacher consistency (reference MT_SSL,
    NN_extended.py:1337-1396): CE of student against the teacher's softened
    posterior, or MSE of posteriors."""
    t_post = jax.lax.stop_gradient(
        jax.nn.softmax(teacher_logits, axis=-1))
    if measure == "CE":
        logp = jax.nn.log_softmax(student_logits, axis=-1)
        return -jnp.mean(jnp.sum(t_post * logp, axis=-1))
    if measure == "MSE":
        s_post = jax.nn.softmax(student_logits, axis=-1)
        return jnp.mean((s_post - t_post) ** 2)
    raise ValueError(measure)


def lwf_loss(logits, y_onehot, old_logits, lambda_o: float, T: float = 2.0):
    """Learning-without-forgetting: CE + distillation against the previous
    model's softened outputs (reference ``get_LwF``, model_utils.py:98-135)."""
    base = cross_entropy(logits, y_onehot)
    soft_target = jax.nn.softmax(old_logits / T, axis=-1)
    logp = jax.nn.log_softmax(logits / T, axis=-1)
    distill = -jnp.mean(jnp.sum(soft_target * logp, axis=-1))
    return base + lambda_o * distill


def weight_decay_penalty(params, coeff: float):
    """L2 penalty over W matrices (reference ``weight_decay`` hyper)."""
    sq = sum(jnp.sum(v["W"].astype(jnp.float32) ** 2)
             for v in params.values() if "W" in v)
    return coeff * sq


def get_loss_fn(name: str = "CE", **kw):
    """Loss dispatch keyed like the reference's ``loss_name`` hyper."""
    if name == "CE":
        return lambda lg, y: cross_entropy(lg, y, kw.get("class_weights"))
    if name == "CE_softclasses":
        return soft_cross_entropy
    if name == "GCE":
        return lambda lg, y: generalized_ce(lg, y, kw.get("q", 0.7))
    if name == "focal":
        return lambda lg, y: focal_loss(lg, y, kw.get("gamma", 2.0),
                                        kw.get("class_weights"))
    raise ValueError(name)
