"""Post-training int8 quantization for serving paths.

A rebuild-native feature with no reference counterpart: the v5e MXU runs
int8 x int8 -> int32 at twice the bf16 macs/cycle, so dense serving
(whole-volume FCN segmentation, posterior-only pool sweeps) can trade a
quantization error for ~2x matmul throughput.  The reference's serving
analogue is ``full_slice_segment`` (eval_utils.py:104-200), float-only.

Design
------
* **Weights**: static symmetric per-output-channel int8 —
  ``W_q = round(W / s_w)``, ``s_w[oc] = max|W[..., oc]| / 127``.
* **Activations**: dynamic symmetric per-tensor int8, computed inside the
  op (one extra |max| reduction per quantized layer — negligible next to
  the conv/fc it feeds).  No calibration data or extra plumbing needed,
  and accuracy is strictly better than static scales.
* **Compute**: ``conv_general_dilated(x_q, W_q,
  preferred_element_type=int32)`` / ``dot(x_q, W_q, ...)``; the int32
  accumulator is rescaled by ``s_x * s_w[oc]`` in f32 and the bias added
  there, so everything around the MXU op (BN, activations, softmax) is
  untouched.

Integration: :func:`quantize_params` returns a *params pytree variant*
(``W`` replaced by ``W_q`` + ``w_scale``); ``apply_cnn``'s spec walk
(skips, center-crops, BN inference, activations) consumes it unchanged —
``models.cnn._main_op`` branches on the presence of ``W_q``.  Serving-only:
the rounding is non-differentiable, so training / FIM scoring keep float
parameters.

``convT`` layers stay float (XLA lowers int8 transposed conv poorly and
they are a small FLOP fraction of FC-DenseNet); so does any conv a caller
lists in ``keep_float``.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

__all__ = ["quantize_params", "is_quantized"]


def _per_out_channel_scale(W: np.ndarray) -> np.ndarray:
    """max|W| over all axes but the last (out-channel), as f32, floored so
    all-zero channels quantize to zeros instead of dividing by zero."""
    absmax = np.max(np.abs(W), axis=tuple(range(W.ndim - 1)))
    return np.maximum(absmax / 127.0, 1e-12).astype(np.float32)


def quantize_params(spec, params, keep_float: Sequence[str] = ()) -> Dict:
    """int8-quantized variant of a ``{layer: {"W", "b", ...}}`` pytree.

    conv / fc layers get ``{"W_q": int8, "w_scale": (out_c,) f32, "b"}``;
    ``convT``, layers named in ``keep_float`` and non-weight leaves (BN
    gamma/beta, aleatoric heads) are passed through unchanged.  The result
    feeds ``apply_cnn`` / the evaluators directly.
    """
    kinds = {layer.name: layer.kind for layer in spec.layers}
    out: Dict = {}
    for name, p in params.items():
        kind = kinds.get(name)
        if kind in ("conv", "fc") and "W" in p and name not in keep_float:
            W = np.asarray(p["W"], np.float32)
            s_w = _per_out_channel_scale(W)
            W_q = np.clip(np.rint(W / s_w), -127, 127).astype(np.int8)
            q = {"W_q": jnp.asarray(W_q), "w_scale": jnp.asarray(s_w)}
            q.update({k: v for k, v in p.items() if k != "W"})
            out[name] = q
        else:
            out[name] = dict(p)
    return out


def is_quantized(params) -> bool:
    return any("W_q" in p for p in params.values())
