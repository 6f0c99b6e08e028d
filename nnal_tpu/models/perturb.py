"""Input perturbation + output-perturbation uncertainty (AU_4U).

Rebuild of the v2 model's aleatoric-for-unlabeled machinery:

* ``perturb_input`` (reference NN_extended.py:913-926) — Gaussian noise
  and/or in-plane rotation of the input batch;
* ``measure_output_perturbation`` (reference NN_extended.py:1502-1519) —
  divergence (L2 of posteriors, or CE against teacher logits) between the
  model's output on the clean input and a (teacher) model's output on the
  perturbed input.  High divergence = unstable prediction = uncertain
  sample, used as a querying signal for unlabeled data.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from nnal_tpu.models.cnn import apply_cnn


def rotate_2d(x: jnp.ndarray, angle: float) -> jnp.ndarray:
    """Bilinear in-plane rotation of a (b, H, W, C) batch about the image
    center (reference tf.contrib.image.rotate)."""
    b, H, W, C = x.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    c, s = jnp.cos(angle), jnp.sin(angle)
    # source coordinates (inverse rotation)
    src_y = c * (yy - cy) + s * (xx - cx) + cy
    src_x = -s * (yy - cy) + c * (xx - cx) + cx

    def one(img):  # (H, W)
        return jax.scipy.ndimage.map_coordinates(
            img, [src_y, src_x], order=1, mode="nearest")

    return jax.vmap(jax.vmap(one, in_axes=-1, out_axes=-1))(x)


def perturb_input(x: jnp.ndarray, rng,
                  gaussian_std: Optional[float] = None,
                  rotation_angle: Optional[float] = None) -> jnp.ndarray:
    """Gaussian noise + rotation (reference ``perturb_input``,
    NN_extended.py:913-926)."""
    out = x
    if gaussian_std:
        out = out + gaussian_std * jax.random.normal(rng, out.shape,
                                                     out.dtype)
    if rotation_angle:
        out = rotate_2d(out, rotation_angle)
    return out


@partial(jax.jit, static_argnames=("spec", "measure", "gaussian_std",
                                   "rotation_angle"))
def measure_output_perturbation(spec, params, x, rng, *,
                                teacher_params=None,
                                measure: str = "CE",
                                gaussian_std: Optional[float] = 0.05,
                                rotation_angle: Optional[float] = None
                                ) -> jnp.ndarray:
    """Per-sample divergence between the model's clean output and the
    (teacher) model's output on the perturbed input (reference
    ``measure_output_perturbation``, NN_extended.py:1502-1519).

    ``measure='L2'``: mean squared posterior difference;
    ``measure='CE'``: cross-entropy of the clean posterior against the
    perturbed (teacher) logits — the reference's exact form (note it lower
    bounds at the clean posterior's entropy, not 0).
    For AU_4U specs the teacher's *clean* logits head is used (the
    aleatoric split already removes the sigma channels in apply_cnn).
    """
    tp = params if teacher_params is None else teacher_params
    clean = apply_cnn(spec, params, x)
    xp = perturb_input(x, rng, gaussian_std, rotation_angle)
    pert = apply_cnn(spec, tp, xp)
    p = clean.posteriors.astype(jnp.float32)
    if measure == "L2":
        q = pert.posteriors.astype(jnp.float32)
        return jnp.mean((p - q) ** 2, axis=-1)
    if measure == "CE":
        logq = jax.nn.log_softmax(pert.logits.astype(jnp.float32), axis=-1)
        return -jnp.sum(p * logq, axis=-1)
    raise ValueError(measure)
