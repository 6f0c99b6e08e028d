"""Functional CNN engine: ``init_cnn`` / ``apply_cnn`` over a :class:`CNNSpec`.

Replaces the reference's graph-building ``CNN`` classes (NN.py:56,
NN_extended.py:20) with pure functions over explicit parameter pytrees
``{layer: {"W": ..., "b": ...}}`` — the JAX-native analogue of the
reference's ``model.var_dict``.  Everything the query layer needs from a
model (posteriors, prediction, feature layer, probes — reference
NN.py:258-377) is returned in one :class:`CNNOutput`, so a single jitted
forward serves training, pool scoring and feature extraction.

Conventions (differ deliberately from the TF1 reference):
* tensors are row-major channels-last — ``(b, *spatial, c)``; posteriors are
  ``(b, nclass)`` (the reference keeps feature-major ``(d, b)`` FC tensors,
  NN.py:303);
* dropout rates are *drop* probabilities (the reference's ``keep_prob``
  placeholder semantics are inverted at the engine seam);
* batch-norm running stats live in an explicit ``state`` pytree.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nnal_tpu.models.specs import CNNSpec, Layer

Params = Dict[str, Dict[str, jnp.ndarray]]


@jax.tree_util.register_dataclass
@dataclass
class CNNOutput:
    logits: jnp.ndarray            # (b, c) or (b, *spatial, c) for FCN
    posteriors: jnp.ndarray        # softmax over class axis
    prediction: jnp.ndarray        # argmax class
    feature: Optional[jnp.ndarray]  # feature-layer activations (b, d)
    probes: Dict[str, jnp.ndarray]
    log_sigma: Optional[jnp.ndarray] = None  # aleatoric head
    state: Optional[Dict] = None   # updated BN stats (train mode)


def _act(name: str):
    return {"relu": jax.nn.relu, "elu": jax.nn.elu, "tanh": jnp.tanh,
            "gelu": jax.nn.gelu, "identity": lambda x: x}[name]


# --------------------------------------------------------------------------- #
# initialization
# --------------------------------------------------------------------------- #
def init_cnn(spec: CNNSpec, key, param_dtype=jnp.float32) -> Tuple[Params, Dict]:
    """He-initialized parameters + BN state.

    The reference He-re-initializes finalized graphs through assign ops
    (NN.py:483-519 ``file_path='init'``); here init is just this function
    with a new key.
    """
    params: Params = {}
    state: Dict = {}
    shapes = _trace_shapes(spec)
    for i, layer in enumerate(spec.layers):
        k_layer = jax.random.fold_in(key, i)
        in_c = shapes[i]["in_c"]
        p: Dict[str, jnp.ndarray] = {}
        if layer.kind in ("conv", "convT"):
            out_c = layer.out if layer.out is not None else in_c
            if layer.kind == "conv":
                w_shape = layer.ksize + (in_c, out_c)
            else:  # convT kernels: spatial + (in, out) for lax.conv_transpose
                w_shape = layer.ksize + (in_c, out_c)
            fan_in = int(np.prod(layer.ksize)) * in_c
            p["W"] = (jax.random.normal(k_layer, w_shape, param_dtype)
                      * np.sqrt(2.0 / fan_in))
            p["b"] = jnp.zeros((out_c,), param_dtype)
        elif layer.kind == "fc":
            in_d = shapes[i]["in_d"]
            p["W"] = (jax.random.normal(k_layer, (in_d, layer.out), param_dtype)
                      * np.sqrt(2.0 / in_d))
            p["b"] = jnp.zeros((layer.out,), param_dtype)
        if "B" in layer.op_order and layer.kind in ("conv", "convT", "fc"):
            bn_c = _bn_width(layer, in_c, shapes[i])
            p["gamma"] = jnp.ones((bn_c,), param_dtype)
            p["beta"] = jnp.zeros((bn_c,), param_dtype)
            state[layer.name] = {"mean": jnp.zeros((bn_c,), jnp.float32),
                                 "var": jnp.ones((bn_c,), jnp.float32)}
        if p:
            params[layer.name] = p
    return params, state


def _bn_width(layer: Layer, in_c: int, shape_info) -> int:
    # BN before main op ('B' precedes 'M') normalizes the input; after, the
    # output (reference op-order semantics, NN_extended.py:297-364)
    before = "M" not in layer.op_order or (
        layer.op_order.index("B") < layer.op_order.index("M"))
    if before:
        return in_c if layer.kind != "fc" else shape_info["in_d"]
    return layer.out if layer.out is not None else in_c


def _trace_shapes(spec: CNNSpec):
    """Static shape trace to size parameters (channels in/out per layer)."""
    rank = spec.spatial_rank
    out_shapes: Dict[str, Tuple[int, ...]] = {
        "__input__": tuple(spec.input_shape)}
    infos = []
    prev_name = "__input__"
    for layer in spec.layers:
        if layer.sources:
            srcs = [out_shapes[s] for s in layer.sources]
            if layer.combine == "concat":
                spatial = tuple(min(s[d] for s in srcs) for d in range(rank))
                in_shape = spatial + (sum(s[-1] for s in srcs),)
            else:
                in_shape = srcs[0]
        else:
            in_shape = out_shapes[prev_name]
        in_c = in_shape[-1]
        in_d = int(np.prod(in_shape))
        if layer.kind == "conv":
            out_c = layer.out if layer.out is not None else in_c
            spatial = tuple(_conv_dim(in_shape[d], layer.ksize[d],
                                      layer.strides[d], layer.padding)
                            for d in range(rank))
            out_shape = spatial + (out_c,)
        elif layer.kind == "convT":
            out_c = layer.out if layer.out is not None else in_c
            spatial = tuple(in_shape[d] * layer.strides[d] for d in range(rank))
            out_shape = spatial + (out_c,)
        elif layer.kind in ("pool", "avgpool"):
            spatial = tuple(_conv_dim(in_shape[d], layer.ksize[d],
                                      layer.strides[d], "SAME")
                            for d in range(rank))
            out_shape = spatial + (in_c,)
        elif layer.kind == "fc":
            out_shape = (layer.out,)
        else:
            raise ValueError(layer.kind)
        infos.append({"in_c": in_c, "in_d": in_d, "in_shape": in_shape,
                      "out_shape": out_shape})
        out_shapes[layer.name] = out_shape
        prev_name = layer.name
    return infos


def _conv_dim(n, k, s, padding):
    if padding == "SAME":
        return -(-n // s)
    return -(-(n - k + 1) // s)


# --------------------------------------------------------------------------- #
# application
# --------------------------------------------------------------------------- #
def _center_crop(x, spatial):
    """Crop spatial dims to ``spatial`` (skip-combine auto-crop, reference
    ``combine_layer_outputs`` crop-resize, NN_extended.py:1119-1216)."""
    rank = len(spatial)
    slices = [slice(None)]
    for d in range(rank):
        extra = x.shape[1 + d] - spatial[d]
        lo = extra // 2
        slices.append(slice(lo, lo + spatial[d]))
    slices.append(slice(None))
    return x[tuple(slices)]


def _dimension_numbers(rank: int):
    if rank == 2:
        return ("NHWC", "HWIO", "NHWC")
    if rank == 3:
        return ("NDHWC", "DHWIO", "NDHWC")
    raise ValueError(rank)


def apply_cnn(spec: CNNSpec, params: Params, x: jnp.ndarray, *,
              train: bool = False, dropout_rng=None, state: Optional[Dict] = None,
              mc_dropout: bool = False, compute_dtype=None,
              bn_decay: float = 0.999) -> CNNOutput:
    """Forward pass.  ``train`` enables dropout + BN batch statistics;
    ``mc_dropout`` enables dropout alone (MC-dropout scoring passes,
    reference PW_NNAL.py:67-87 feeds ``keep_prob=dropout_rate`` at eval).
    ``bn_decay`` overrides the BN running-stat momentum (reference
    default 0.999) — statistics-refresh passes use an aggressive decay
    so a handful of batches actually re-centers the moving averages
    (at 0.999, 8 updates move them 0.8%)."""
    rank = spec.spatial_rank
    act = _act(spec.activation)
    use_dropout = (train or mc_dropout) and dropout_rng is not None
    new_state: Dict = {} if state is not None else None
    if compute_dtype is not None:
        x = x.astype(compute_dtype)

    outputs: Dict[str, jnp.ndarray] = {"__input__": x}
    prev = "__input__"
    probes: Dict[str, jnp.ndarray] = {}
    feature = None

    for i, layer in enumerate(spec.layers):
        if layer.sources:
            srcs = [outputs[s] for s in layer.sources]
            if layer.combine == "concat":
                spatial = tuple(min(s.shape[1 + d] for s in srcs)
                                for d in range(rank))
                srcs = [_center_crop(s, spatial) for s in srcs]
                h = jnp.concatenate(srcs, axis=-1)
            else:
                h = srcs[0]
                for s in srcs[1:]:
                    h = h + _center_crop(s, h.shape[1:1 + rank])
        else:
            h = outputs[prev]

        p = params.get(layer.name, {})
        for op in layer.op_order if layer.kind not in ("pool", "avgpool") \
                else "M":
            if op == "M":
                h = _main_op(spec, layer, p, h, rank)
            elif op == "B":
                h, bn_stats = _batch_norm(layer, p, h, state, train,
                                          decay=bn_decay)
                if new_state is not None:
                    new_state[layer.name] = bn_stats
            elif op == "A":
                h = act(h)
        if layer.dropout > 0 and use_dropout:
            k = jax.random.fold_in(dropout_rng, i)
            keep = 1.0 - layer.dropout
            mask = jax.random.bernoulli(k, keep, h.shape)
            h = jnp.where(mask, h / keep, 0.0)

        outputs[layer.name] = h
        prev = layer.name
        if i in spec.probes:
            probes[layer.name] = h
        if spec.feature_layer is not None and i == spec.feature_layer:
            feature = h.reshape(h.shape[0], -1) if not spec.fcn else h

    logits = outputs[prev]
    log_sigma = None
    if spec.aleatoric:
        logits, log_sigma = jnp.split(logits, 2, axis=-1)
    logits32 = logits.astype(jnp.float32)
    posteriors = jax.nn.softmax(logits32, axis=-1)
    prediction = jnp.argmax(logits32, axis=-1)
    return CNNOutput(logits=logits32, posteriors=posteriors,
                     prediction=prediction, feature=feature, probes=probes,
                     log_sigma=log_sigma, state=new_state)


def cast_float_params(params: Params, cd) -> Params:
    """Cast parameter leaves to a compute dtype, leaving int8-quantized
    weights and their f32 dequantization scales (``models.quant`` pytrees)
    untouched — a blanket ``tree_map(astype)`` would silently dequantize
    ``W_q`` and truncate ``w_scale``."""
    return {name: {k: (v if k in ("W_q", "w_scale") else v.astype(cd))
                   for k, v in p.items()}
            for name, p in params.items()}


def make_conv_f32acc(strides, padding, rank):
    """bf16-storage conv with f32 accumulation whose VJP stays legal.

    Forward: bf16 operands, ``preferred_element_type=f32`` (exactly the
    MXU's native mode).  The standard VJP of that op is ill-typed in this
    JAX version — the transpose conv mixes the f32 cotangent with the bf16
    filter ("lax.conv_general_dilated requires arguments to have the same
    dtypes").  The custom backward casts the cotangent to the operand
    dtype and takes the VJP of the *uniform-dtype* conv — the same linear
    map, rounded at bf16 (the MXU still accumulates f32 internally).
    Shared by the FIM scoring path (``scoring/gradients.py``, rank parity
    tested) and bf16 mixed-precision training (``models/train.py``)."""

    def raw(h, w, pref):
        dn = jax.lax.conv_dimension_numbers(h.shape, w.shape,
                                            _dimension_numbers(rank))
        return jax.lax.conv_general_dilated(
            h, w, strides, padding, dimension_numbers=dn,
            preferred_element_type=pref)

    @jax.custom_vjp
    def conv(h, w):
        return raw(h, w, jnp.float32)

    def fwd(h, w):
        return raw(h, w, jnp.float32), (h, w)

    def bwd(res, g):
        h, w = res
        _, vjp = jax.vjp(lambda hh, ww: raw(hh, ww, None), h, w)
        return vjp(g.astype(h.dtype))

    conv.defvjp(fwd, bwd)
    return conv


def _quantize_act(h):
    """Dynamic symmetric per-tensor int8: one |max| reduction + rounding.
    Scales are computed in f32 regardless of the activation dtype."""
    h32 = h.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(h32)), 1e-12) / 127.0
    h_q = jnp.clip(jnp.round(h32 / s_x), -127, 127).astype(jnp.int8)
    return h_q, s_x


def _int8_main(layer, p, h, rank):
    """int8 MXU path for conv/fc (``models.quant`` pytrees): int8 x int8
    -> int32 accumulate, rescale by ``s_x * w_scale[oc]`` in f32, bias in
    f32, back to the incoming activation dtype."""
    dt = h.dtype
    h_q, s_x = _quantize_act(h)
    if layer.kind == "conv":
        dn = jax.lax.conv_dimension_numbers(
            h.shape, p["W_q"].shape, _dimension_numbers(rank))
        acc = jax.lax.conv_general_dilated(
            h_q, p["W_q"], layer.strides, layer.padding,
            dimension_numbers=dn, preferred_element_type=jnp.int32)
    else:  # fc
        acc = jnp.dot(h_q.reshape(h_q.shape[0], -1), p["W_q"],
                      preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s_x * p["w_scale"])
    return (y + p["b"].astype(jnp.float32)).astype(dt)


def _main_op(spec, layer, p, h, rank):
    if "W_q" in p and layer.kind in ("conv", "fc"):
        return _int8_main(layer, p, h, rank)
    if layer.kind == "conv":
        dt = h.dtype
        if dt != jnp.float32:
            # same forward as below (f32 accumulation), but with a legal
            # VJP so bf16 mixed-precision training can differentiate it
            y = make_conv_f32acc(layer.strides, layer.padding,
                                 rank)(h, p["W"].astype(dt))
            return (y + p["b"]).astype(dt)
        dn = jax.lax.conv_dimension_numbers(
            h.shape, p["W"].shape, _dimension_numbers(rank))
        y = jax.lax.conv_general_dilated(
            h, p["W"].astype(dt), layer.strides, layer.padding,
            dimension_numbers=dn, preferred_element_type=jnp.float32)
        return (y + p["b"]).astype(dt)
    if layer.kind == "convT":
        h = jax.lax.conv_transpose(
            h, p["W"].astype(h.dtype), layer.strides, layer.padding,
            dimension_numbers=_dimension_numbers(rank))
        return h + p["b"].astype(h.dtype)
    if layer.kind == "pool":
        window = (1,) + layer.ksize + (1,)
        strides = (1,) + layer.strides + (1,)
        return jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, window,
                                     strides, layer.padding)
    if layer.kind == "avgpool":
        window = (1,) + layer.ksize + (1,)
        strides = (1,) + layer.strides + (1,)
        s = jax.lax.reduce_window(h, 0.0, jax.lax.add, window, strides,
                                  layer.padding)
        return s / float(np.prod(layer.ksize))
    if layer.kind == "fc":
        dt = h.dtype
        h2 = h.reshape(h.shape[0], -1)
        return (jnp.dot(h2, p["W"].astype(dt),
                        preferred_element_type=jnp.float32)
                + p["b"]).astype(dt)
    raise ValueError(layer.kind)


def _batch_norm(layer, p, h, state, train, eps=1e-3, decay=0.999):
    """Batch normalization with running statistics (reference uses
    tf.contrib.layers.batch_norm with decay 0.999/eps 1e-3,
    NN_extended.py:470-536)."""
    axes = tuple(range(h.ndim - 1))
    if train or state is None or layer.name not in state:
        mean = jnp.mean(h, axis=axes)
        var = jnp.var(h, axis=axes)
    else:
        mean = state[layer.name]["mean"].astype(h.dtype)
        var = state[layer.name]["var"].astype(h.dtype)
    normed = (h - mean) / jnp.sqrt(var + eps)
    out = normed * p["gamma"].astype(h.dtype) + p["beta"].astype(h.dtype)
    if train and state is not None and layer.name in state:
        new_stats = {
            "mean": decay * state[layer.name]["mean"]
            + (1 - decay) * mean.astype(jnp.float32),
            "var": decay * state[layer.name]["var"]
            + (1 - decay) * var.astype(jnp.float32),
        }
    else:
        new_stats = state.get(layer.name) if state is not None else None
    return out, new_stats


def count_parameters(params: Params) -> int:
    """Total parameter count (reference NN_extended.py:1036)."""
    return int(sum(np.prod(v.shape) for layer in params.values()
                   for v in layer.values()))


@partial(jax.jit, static_argnames=("spec",))
def forward_posteriors(spec: CNNSpec, params: Params, x: jnp.ndarray):
    """Jitted posterior sweep — the pool-scoring workhorse."""
    return apply_cnn(spec, params, x).posteriors
